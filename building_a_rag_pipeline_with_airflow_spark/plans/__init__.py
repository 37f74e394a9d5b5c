"""Plan-level utilities: read-only SQL gate, TTL cache, plan inspection."""
