"""Sources & sinks (SURVEY §2.1/§2.2)."""
