"""Corpus observability report (operators/report.py): known-value
metrics on a handcrafted corpus plus real-corpus sanity."""

from __future__ import annotations

from pandasql_spark.operators.report import corpus_report

SF = "/root/testdata/sf0.001"


def test_known_values(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c", "en"),       # 3 tokens
            (1, "a b c", "en"),       # exact dup of 0
            (2, "d e", "fr"),         # 2 tokens
            (3, "f g h i", "fr"),     # 4 tokens
        ],
        "doc_id long, text string, lang string",
    )
    m = {r.metric: r.value for r in corpus_report(df, stratum_col="lang").collect()}
    assert m["n_docs"] == 4.0
    assert m["n_tokens"] == 12.0
    assert m["avg_tokens"] == 3.0
    assert m["exact_dup_rate"] == 0.25
    assert m["docs_lang=en"] == 2.0 and m["docs_lang=fr"] == 2.0
    # sorted tcs: [2,3,3,4]; ceil(q*4): p25→pos1=2, p50→pos2=3,
    # p75→pos3=3, p95→pos4=4
    assert (m["p25_tokens"], m["p50_tokens"], m["p75_tokens"], m["p95_tokens"]) == (
        2.0, 3.0, 3.0, 4.0,
    )


def test_no_stratum(spark):
    df = spark.createDataFrame(
        [(0, "a b", "en")], "doc_id long, text string, lang string"
    )
    metrics = {r.metric for r in corpus_report(df).collect()}
    assert not any(met.startswith("docs_lang") for met in metrics)
    assert "n_docs" in metrics and "p50_tokens" in metrics


def test_real_corpus_consistency(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m = {r.metric: r.value for r in corpus_report(docs, stratum_col="lang").collect()}
    assert m["n_docs"] == docs.count()
    lang_total = sum(v for k, v in m.items() if k.startswith("docs_lang="))
    assert lang_total == m["n_docs"]
    assert m["p25_tokens"] <= m["p50_tokens"] <= m["p75_tokens"] <= m["p95_tokens"]
    assert 0.0 <= m["exact_dup_rate"] < 1.0


def test_cleanup_hook_releases_persisted_ranking(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = corpus_report(docs)
    out.collect()
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert hasattr(out, "cleanup")
    out.cleanup(blocking=True)
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before


def test_audio_metrics_known_values(spark):
    """audio_col folds decoded duration/RMS metrics into the report:
    3 decodable payloads (1 s, 2 s, 4 s of a known ramp) + 1 corrupt,
    across two sources — every audio metric has a closed-form value."""
    import numpy as np

    from pandasql_spark.functions.audiocodec import encode_wav

    def wav(seconds, rate=1000):
        ramp = (np.arange(seconds * rate) % 100).astype(np.int16)
        return bytearray(encode_wav(ramp, rate))

    rows = [
        (0, "a b", "web", wav(1)),
        (1, "c d", "web", wav(2)),
        (2, "e f", "book", wav(4)),
        (3, "g h", "book", bytearray(b"junk" * 4)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, payload binary"
    )
    out = corpus_report(
        df, stratum_col="source", audio_col="payload",
        length_quantiles=(0.5, 1.0),
    )
    m = {r.metric: r.value for r in out.collect()}
    assert m["n_audio_ok"] == 3.0
    assert m["audio_decode_fail_rate"] == 0.25
    assert m["audio_seconds_total"] == 7.0
    assert m["audio_seconds_source=web"] == 3.0
    assert m["audio_seconds_source=book"] == 4.0
    # duration percentiles over DECODABLE payloads only: [1, 2, 4]
    assert m["p50_audio_seconds"] == 2.0
    assert m["p100_audio_seconds"] == 4.0
    # RMS of (i % 100) ramp is the same for every payload length that is
    # a multiple of 100 samples: sqrt(sum(i^2, i<100)/100)
    expected_rms = round(float(np.sqrt(np.mean(np.arange(100.0) ** 2))), 6)
    assert m["avg_audio_rms"] == expected_rms
    # text metrics still present alongside
    assert m["n_docs"] == 4.0 and m["docs_source=web"] == 2.0
    out.cleanup(blocking=True)


def test_corpus_report_empty_corpus(spark):
    """r16 review finding: an empty corpus must produce the volume
    metrics (zeros/NULLs) without raising — exact_percentiles' empty
    path now carries the cleanup contract, and the base cache is
    released."""
    from pandasql_spark.operators.report import corpus_report

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    out = corpus_report(empty, stratum_col="lang")
    rows = {r["metric"]: r["value"] for r in out.collect()}
    assert rows["n_docs"] == 0.0
    out.cleanup()
