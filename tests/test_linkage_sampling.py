"""Unit tests for blocked fuzzy linkage (operators/linkage.py), weighted
deterministic sampling (sampling.weighted_sample_topk / hash_uniform),
and the Markov transition matrix (analytics.transition_matrix). Value
parity vs DuckDB is covered by tests/test_oracle_parity.py
(fuzzy_match_parts, weighted_sample_documents, event_transition_matrix).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import analytics, linkage, sampling


def test_blocked_fuzzy_pairs_within_block_only(spark):
    df = spark.createDataFrame(
        [
            (1, "red bolt"),
            (2, "red bold"),   # distance 1, same block "bolt" vs "bold"? NO: different last token
            (3, "rad bolt"),   # distance 1 to "red bolt", same block
            (4, "red widget"), # different block entirely
        ],
        "id int, name string",
    )
    pairs = linkage.blocked_fuzzy_pairs(
        df, "id", "name", linkage.last_token_block("name"), max_distance=2
    ).collect()
    got = {(r.id_a, r.id_b, r.distance) for r in pairs}
    # only (1,3) share the "bolt" block; (1,2) is distance 1 but blocked apart
    assert got == {(1, 3, 1)}


def test_blocked_fuzzy_pairs_max_block_guard(spark):
    rows = [(i, f"name {i} thing") for i in range(10)]
    df = spark.createDataFrame(rows, "id int, name string")
    # every row lands in block "thing"; cap below the block size drops it
    none = linkage.blocked_fuzzy_pairs(
        df, "id", "name", linkage.last_token_block("name"),
        max_distance=50, max_block=5,
    )
    assert none.count() == 0
    some = linkage.blocked_fuzzy_pairs(
        df, "id", "name", linkage.last_token_block("name"),
        max_distance=50, max_block=10,
    )
    assert some.count() == 45  # 10 choose 2


def test_soundex_block_groups_homophones(spark):
    df = spark.createDataFrame(
        [(1, "Robert"), (2, "Rupert"), (3, "Ashcraft")], "id int, name string"
    )
    blocks = {
        r.id: r.b
        for r in df.select("id", linkage.soundex_block("name").alias("b")).collect()
    }
    assert blocks[1] == blocks[2] != blocks[3]  # classic R163/R163/A261


def test_hash_uniform_range_and_determinism(spark):
    df = spark.range(1000).select(
        sampling.hash_uniform("id").alias("u"),
        sampling.hash_uniform("id", salt="other").alias("u2"),
    )
    agg = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"),
        F.avg("u").alias("mean"),
        F.sum((F.col("u") == F.col("u2")).cast("int")).alias("same"),
    ).first()
    assert 0.0 < agg.lo and agg.hi <= 1.0
    assert 0.4 < agg.mean < 0.6          # roughly uniform
    assert agg.same < 5                   # salt decorrelates
    # repartitioning must not change values (content-addressed)
    a = sorted(r.u for r in df.select("u").collect())
    b = sorted(
        r.u
        for r in spark.range(1000).repartition(7)
        .select(sampling.hash_uniform("id").alias("u")).collect()
    )
    assert a == b


def test_weighted_sample_topk_weight_bias_and_determinism(spark):
    # two strata: weight 100 vs weight 1 — the heavy stratum must dominate
    df = spark.range(2000).select(
        "id", F.when(F.col("id") < 1000, 100.0).otherwise(1.0).alias("w")
    )
    top = sampling.weighted_sample_topk(df, "id", "w", k=100)
    rows = top.collect()
    heavy = sum(1 for r in rows if r.w == 100.0)
    assert heavy > 80
    again = sampling.weighted_sample_topk(df.repartition(13), "id", "w", k=100)
    assert {r.id for r in rows} == {r.id for r in again.collect()}


def test_weighted_sample_topk_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1, 0.0)], "id int, w double")
    with pytest.raises(Exception, match="non-positive or NULL"):
        sampling.weighted_sample_topk(df, "id", "w", k=1).collect()
    with pytest.raises(ValueError):
        sampling.weighted_sample_topk(df, "id", "w", k=0)


def test_transition_matrix_counts_and_probs(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
            (2, 1, "a"), (2, 2, "c"),
        ],
        "user int, t int, s string",
    )
    out = {
        (r.prev_state, r.s): (r.n, r.p)
        for r in analytics.transition_matrix(df, "user", "t", "s").collect()
    }
    # from 'a': a->b twice, a->c once; from 'b': b->a once
    assert out[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert out[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert out[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in out  # terminal state contributes no row


def test_weighted_sample_per_group_semantics(spark):
    from building_a_rag_pipeline_with_airflow_spark.operators import sampling

    rows = [(g, i, float(10 + i)) for g in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, "g string, id int, w double")
    out = sampling.weighted_sample_per_group(df, ["g"], "id", "w", k=3)
    got = out.collect()
    # exactly k per group
    from collections import Counter

    assert Counter(r.g for r in got) == {"a": 3, "b": 3}
    # per-group picks are that group's top-3 priorities (verified against
    # the global operator applied per slice)
    for g in ("a", "b"):
        expect = {
            r.id
            for r in sampling.weighted_sample_topk(
                df.where(F.col("g") == g), "id", "w", k=3
            ).collect()
        }
        assert {r.id for r in got if r.g == g} == expect


def test_weighted_sample_per_group_rejects_bad(spark):
    from building_a_rag_pipeline_with_airflow_spark.operators import sampling

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, id int, w double")
    with pytest.raises(ValueError):
        sampling.weighted_sample_per_group(df, ["g"], "id", "w", k=0)


def test_weighted_sample_per_group_salted_equals_plain(spark):
    """The salted two-phase selection must equal the plain one-window
    per-group top-k exactly (any group-wide winner is also a winner
    within its salt slice), for several salt counts including 1."""
    from pyspark.sql import Window

    from building_a_rag_pipeline_with_airflow_spark.operators import sampling

    rows = [(g, i, float(1 + (i * 7) % 13)) for g in ("a", "b", "c") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, id int, w double")
    pri = F.pow(sampling.hash_uniform("id", "wsample"), 1.0 / F.col("w"))
    w = Window.partitionBy("g").orderBy(F.desc("priority"), "id")
    plain = {
        (r.g, r.id)
        for r in df.withColumn("priority", pri)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 5)
        .collect()
    }
    for n_salts in (1, 4, 16):
        got = {
            (r.g, r.id)
            for r in sampling.weighted_sample_per_group(
                df, ["g"], "id", "w", k=5, n_salts=n_salts
            ).collect()
        }
        assert got == plain, n_salts


def test_trigram_topk_finds_exact_and_near(spark):
    from building_a_rag_pipeline_with_airflow_spark.operators import linkage

    corpus = spark.createDataFrame(
        [(1, "chocolate brown metal"), (2, "chocolate brown steel"),
         (3, "ivory white copper"), (4, "xy")],
        "name_id int, name string",
    )
    queries = spark.createDataFrame(
        [(10, "chocolate brown metal"), (11, "ivory white coper")],
        "q_id int, q_text string",
    )
    out = {
        (r.q_id, r.rank): (r.name_id, r.score)
        for r in linkage.trigram_topk(queries, corpus, k=2).collect()
    }
    # exact match scores 1.0 and ranks first
    assert out[(10, 1)] == (1, 1.0)
    assert out[(10, 2)][0] == 2  # near variant second
    # typo query still ranks its target first, below 1.0
    assert out[(11, 1)][0] == 3 and 0 < out[(11, 1)][1] < 1.0


def test_trigram_topk_stop_gram_guard(spark):
    """Grams above max_posting are dropped from the index: with every
    corpus gram over the cap there are no candidates at all."""
    from building_a_rag_pipeline_with_airflow_spark.operators import linkage

    corpus = spark.createDataFrame(
        [(i, "aaaa") for i in range(5)], "name_id int, name string"
    )
    queries = spark.createDataFrame([(1, "aaaa")], "q_id int, q_text string")
    assert linkage.trigram_topk(queries, corpus, k=3, max_posting=2).isEmpty()
    assert linkage.trigram_topk(queries, corpus, k=3).count() == 3


def test_trigram_topk_rejects_bad_k(spark):
    from building_a_rag_pipeline_with_airflow_spark.operators import linkage

    df = spark.createDataFrame([(1, "abc")], "name_id int, name string")
    q = spark.createDataFrame([(1, "abc")], "q_id int, q_text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        linkage.trigram_topk(q, df, k=0)


def test_weighted_sample_logw_matches_linear_form(spark):
    """Log-space A-ES must select the SAME sample as the linear form
    wherever exp(log_weight) is representable — the two priorities are
    monotone transforms of each other."""
    import math

    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    lin = sampling.weighted_sample_topk(df, "id", "w", k=40, salt="s1")
    logd = df.withColumn("lw", F.log("w"))
    logf = sampling.weighted_sample_logw(logd, "id", "lw", k=40, salt="s1")
    assert {r.id for r in lin.collect()} == {r.id for r in logf.collect()}
    # and it keeps working where the linear form CANNOT: weights exp(900)
    huge = df.withColumn("lw", F.lit(900.0) + F.col("w"))
    got = sampling.weighted_sample_logw(huge, "id", "lw", k=10).collect()
    assert len(got) == 10
    assert all(math.isfinite(r.priority) for r in got)


def test_dsir_importance_weights_prefers_target_like_docs(spark):
    """Documents drawn from the target's vocabulary must out-score
    documents from a disjoint vocabulary, deterministically."""
    from building_a_rag_pipeline_with_airflow_spark.operators import curation

    a_words = "alpha beta gamma delta epsilon"
    b_words = "zork quux blarg wibble frotz"
    raw = spark.createDataFrame(
        [(i, a_words if i < 10 else b_words) for i in range(20)],
        "doc_id bigint, text string",
    )
    target = spark.createDataFrame(
        [(100 + i, a_words) for i in range(5)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.log_weight
        for r in curation.dsir_importance_weights(raw, target).collect()
    }
    assert len(got) == 20 and all(r is not None for r in got.values())
    a_scores = [got[i] for i in range(10)]
    b_scores = [got[i] for i in range(10, 20)]
    assert min(a_scores) > max(b_scores)
    # identical docs score identically (pure function of content)
    assert len(set(a_scores)) == 1 and len(set(b_scores)) == 1

    with pytest.raises(ValueError):
        curation.dsir_importance_weights(raw, target, n_buckets=1)
    with pytest.raises(ValueError):
        curation.dsir_importance_weights(raw, target, alpha=0.0)
    with pytest.raises(ValueError):
        curation.dsir_importance_weights(
            raw, target.where(F.col("doc_id") < 0)
        ).collect()


def test_nb_domain_classify_learns_disjoint_vocabularies(spark):
    from building_a_rag_pipeline_with_airflow_spark.operators import curation

    voc = {
        "en": "the quick brown fox jumps",
        "de": "der schnelle braune fuchs springt",
        "fr": "le rapide renard brun saute",
    }
    labeled = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(
            [(l, t) for l, t in voc.items() for _ in range(4)]
        )],
        "doc_id bigint, lang string, text string",
    )
    score = spark.createDataFrame(
        [(100, voc["en"]), (101, voc["de"]), (102, voc["fr"]),
         (103, "fox " + voc["en"])],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in curation.nb_domain_classify(labeled, score).collect()}
    assert got[100].pred == "en" and got[101].pred == "de" and got[102].pred == "fr"
    assert got[103].pred == "en"
    assert all(r.margin > 0 for r in got.values())  # contested, decisive
    # deterministic pure function of content
    again = {r.doc_id: r for r in curation.nb_domain_classify(labeled, score).collect()}
    assert {k: (v.pred, v.score) for k, v in got.items()} == {
        k: (v.pred, v.score) for k, v in again.items()
    }

    with pytest.raises(ValueError):
        curation.nb_domain_classify(labeled, score, n_buckets=1)
    with pytest.raises(ValueError):
        curation.nb_domain_classify(labeled, score, alpha=0.0)
    with pytest.raises(ValueError):
        curation.nb_domain_classify(
            labeled.where(F.col("doc_id") < 0), score
        ).collect()


def test_nb_domain_classify_single_class_margin_zero(spark):
    from building_a_rag_pipeline_with_airflow_spark.operators import curation

    labeled = spark.createDataFrame(
        [(1, "en", "hello world")], "doc_id bigint, lang string, text string"
    )
    got = curation.nb_domain_classify(
        labeled, spark.createDataFrame([(9, "hello again")], "doc_id bigint, text string")
    ).collect()
    assert len(got) == 1 and got[0].pred == "en" and got[0].margin == 0.0


def test_release_corpus_end_to_end(spark, sf_dir, tmp_path):
    """The release capstone: curate -> contract gate -> immutable write +
    manifest publish -> doc-level diff vs the previous release; a failed
    contract publishes NOTHING."""
    import os

    from building_a_rag_pipeline_with_airflow_spark.operators import curation
    from building_a_rag_pipeline_with_airflow_spark.sources import index_layout

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    root = str(tmp_path / "releases")
    man = str(tmp_path / "manifest")

    r1 = curation.release_corpus(
        docs.where(F.col("doc_id") % 2 == 0), root, man, "v1"
    )
    assert set(r1) == {"audit", "contract"}
    assert all(r["passed"] for r in r1["contract"].collect())
    v1 = index_layout.current_index(spark, man)
    assert v1.endswith("/v1") and os.path.exists(v1)
    n1 = spark.read.parquet(v1).count()
    assert n1 > 0

    r2 = curation.release_corpus(
        docs, root, man, "v2", prev_release_path=v1
    )
    v2 = index_layout.current_index(spark, man)
    assert v2.endswith("/v2")
    diff = r2["diff"]
    stats = {r["status"]: r["cnt"] for r in
             diff.groupBy("status").agg(F.count("*").alias("cnt")).collect()}
    assert stats.get("added", 0) > 0        # the odd ids arrived in v2
    # a few "removed" rows are real: odd docs joining a near-dup cluster
    # can switch the cluster's canonical doc — exactly the churn the
    # release diff exists to surface
    assert stats.get("removed", 0) < stats["added"]

    # a contract the corpus cannot meet: nothing new is published
    import pytest as _pytest

    with _pytest.raises(ValueError, match="contract failed"):
        curation.release_corpus(
            docs, root, man, "v3",
            expectations=[{"name": "impossible", "kind": "min_rows",
                           "n": 10_000_000}],
        )
    assert index_layout.current_index(spark, man) == v2
    assert not os.path.exists(f"{root}/v3")


def test_weighted_sample_logw_rejects_null_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, None)], "id bigint, lw double"
    )
    with pytest.raises(Exception, match="NULL log_weight"):
        sampling.weighted_sample_logw(df, "id", "lw", k=2).collect()


def test_trigram_from_index_cross_batch_stop_gram_recount(spark, tmp_path):
    """The extended-index recount rule, end to end: a gram under
    max_posting in EVERY batch but over it across batches must still be
    dropped by `trigram_topk_from_index` — the stored batch-local
    gram_df would miss it, so the extended path recounts in-plan over
    the workload-pruned postings (and must match the in-plan operator
    over the full corpus)."""
    from building_a_rag_pipeline_with_airflow_spark.streaming import ingest

    # gram "aaa" sits in 2 names per batch (under the cap of 3) but 4
    # across both (over it); each name keeps one unique second gram.
    base = spark.createDataFrame(
        [(1, "aaab"), (3, "aaac")], "name_id int, name string"
    )
    new = spark.createDataFrame(
        [(2, "aaad"), (4, "aaae")], "name_id int, name string"
    )
    queries = spark.createDataFrame(
        [(10, "aaaq")], "q_id int, q_text string"  # grams {aaa, aaq}
    )
    path = str(tmp_path / "idx")
    linkage.build_trigram_index(base, path, n_buckets=4)

    # fresh index, cap 3: per-batch df 2 <= 3 keeps "aaa" -> 2 hits
    fresh = linkage.trigram_topk_from_index(
        spark, path, queries, k=5, max_posting=3
    )
    assert fresh.count() == 2

    landing = tmp_path / "landing"
    landing.mkdir()
    new.write.parquet(str(landing / "d1"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(landing / "d1")).schema
    ).parquet(f"{landing}/*")
    q = ingest.streaming_extend_trigram_index(
        stream, path, str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    # extended: recount sees cross-batch df 4 > 3, drops "aaa"; "aaq"
    # matches nothing -> empty, exactly like in-plan over full corpus
    ext = linkage.trigram_topk_from_index(
        spark, path, queries, k=5, max_posting=3
    )
    assert ext.isEmpty()
    assert linkage.trigram_topk(
        queries, base.union(new), k=5, max_posting=3
    ).isEmpty()


def test_trigram_from_index_none_max_posting_matches_inplan(spark, tmp_path):
    """max_posting=None (the no-stop-gram-guard mode trigram_topk
    supports) must work identically from the index — on both the fresh
    pushed-guard path and the extended recount path."""
    from building_a_rag_pipeline_with_airflow_spark.streaming import ingest

    base = spark.createDataFrame(
        [(i, "aaaa") for i in range(1, 6, 2)], "name_id int, name string"
    )
    new = spark.createDataFrame(
        [(i, "aaaa") for i in range(2, 7, 2)], "name_id int, name string"
    )
    queries = spark.createDataFrame([(1, "aaaa")], "q_id int, q_text string")

    path = str(tmp_path / "np_idx")
    linkage.build_trigram_index(base, path, n_buckets=4)

    def rows(df):
        return sorted(map(str, (tuple(r) for r in df.collect())))

    assert rows(
        linkage.trigram_topk_from_index(spark, path, queries, k=9,
                                        max_posting=None)
    ) == rows(linkage.trigram_topk(queries, base, k=9, max_posting=None))

    landing = tmp_path / "np_landing"
    landing.mkdir()
    new.write.parquet(str(landing / "d1"))
    stream = spark.readStream.schema("name_id int, name string").parquet(
        f"{landing}/*"
    )
    ingest.streaming_extend_trigram_index(
        stream, path, str(tmp_path / "np_ck")
    ).awaitTermination(120)

    assert rows(
        linkage.trigram_topk_from_index(spark, path, queries, k=9,
                                        max_posting=None)
    ) == rows(
        linkage.trigram_topk(queries, base.union(new), k=9, max_posting=None)
    )


def test_trigram_null_names_gram_to_nothing(spark, tmp_path):
    """NULL strings contribute NO grams (trigram_set filters the NULL
    substr): a NULL name/query is simply unsearchable in-plan; an
    all-NULL corpus fails the index build's emptiness guard LOUDLY
    instead of writing an empty postings dir every from-index read
    would crash on; and an all-NULL extension batch is a zero-derive
    skip — it must NOT flip meta.extended off the pushed-guard fast
    path (it lands no postings to justify the recount)."""
    from building_a_rag_pipeline_with_airflow_spark.sources import index_layout
    from building_a_rag_pipeline_with_airflow_spark.streaming import ingest

    corpus = spark.createDataFrame(
        [(1, "aaab"), (2, None)], "name_id int, name string"
    )
    queries = spark.createDataFrame(
        [(10, "aaab"), (11, None)], "q_id int, q_text string"
    )
    got = linkage.trigram_topk(queries, corpus, k=5).collect()
    assert [(r.q_id, r.name_id) for r in got] == [(10, 1)]

    all_null = spark.createDataFrame([(7, None)], "name_id int, name string")
    with pytest.raises(Exception, match="trigram index postings"):
        linkage.build_trigram_index(all_null, str(tmp_path / "bad"))

    path = str(tmp_path / "idx")
    linkage.build_trigram_index(corpus, path, n_buckets=4)
    landing = tmp_path / "landing"
    landing.mkdir()
    all_null.write.parquet(str(landing / "d1"))
    stream = spark.readStream.schema("name_id int, name string").parquet(
        f"{landing}/*"
    )
    ingest.streaming_extend_trigram_index(
        stream, path, str(tmp_path / "ck")
    ).awaitTermination(120)
    assert not bool(index_layout.read_meta(spark, path).extended)
    got = linkage.trigram_topk_from_index(spark, path, queries, k=5).collect()
    assert [(r.q_id, r.name_id) for r in got] == [(10, 1)]
