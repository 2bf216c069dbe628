"""spark-submit driver (jobs/run_dedup.py): detector gating, output layout,
and the agreement sink — run in-process against a tiny synthetic corpus.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

import run_dedup  # noqa: E402


def test_empty_detector_list_rejected(spark, tmp_path):
    with pytest.raises(SystemExit, match="at least one detector"):
        run_dedup.main(["--output", str(tmp_path / "o"), "--detectors", "", "--synth", "50"])


def test_unknown_detector_rejected(spark, tmp_path):
    with pytest.raises(SystemExit, match="unknown detectors"):
        run_dedup.main(["--output", str(tmp_path / "o"), "--detectors", "minhash,bogus", "--synth", "50"])


def test_substring_only_skips_minhash_pipeline(spark, tmp_path):
    out_dir = str(tmp_path / "ss")
    summary = run_dedup.main(["--output", out_dir, "--detectors", "substring", "--synth", "300"])
    assert summary["detectors"] == ["substring"]
    assert summary["stage_seconds"] == {}  # pipeline never ran
    pairs = spark.read.parquet(os.path.join(out_dir, "pairs"))
    # pairs come only from the requested detector
    assert {r["detector"] for r in pairs.select("detector").distinct().collect()} <= {"substring"}
    assert not os.path.exists(os.path.join(out_dir, "metrics"))  # no pipeline metrics
    # clusters + canonical still produced
    assert spark.read.parquet(os.path.join(out_dir, "clusters")).count() == 300
    canon = spark.read.parquet(os.path.join(out_dir, "canonical"))
    assert canon.where("is_canonical").count() == summary["clusters"]


def test_multi_detector_agreement_output(spark, tmp_path):
    out_dir = str(tmp_path / "multi")
    summary = run_dedup.main(
        ["--output", out_dir, "--detectors", "minhash,simhash", "--synth", "300"]
    )
    ag = spark.read.parquet(os.path.join(out_dir, "agreement"))
    assert {"minhash_found", "simhash_found", "agreement_pattern", "n_detectors"} <= set(ag.columns)
    # simhash may legitimately find 0 pairs at this corpus size (planted
    # near-dups can exceed hamming 3); the union table must still carry every
    # minhash pair and the agreement schema
    assert ag.count() >= max(summary["simhash_pairs"], 1)
    assert ag.where("minhash_found").count() == summary["verified_pairs"]
    pairs = spark.read.parquet(os.path.join(out_dir, "pairs"))
    assert {r["detector"] for r in pairs.select("detector").distinct().collect()} >= {"minhash"}


def test_cascade_fused_writes_drop_accounting(spark, tmp_path):
    """The FUSED (production) cascade must still persist the never-silent
    accounting: over-cap dropped bands and the estimate gate's gated-pair
    count land in the tier_accounting parquet next to the output."""
    import json

    base = " ".join(f"tok{i}" for i in range(300))
    # 12 near-identical (NOT exact-identical) boilerplate pages: they survive
    # the exact tier, then share most MinHash bands -> band size 12 > cap 4
    rows = [(f"https://ex.com/{i}", f"{base} suffix{i}") for i in range(12)]
    rows += [
        (f"https://uniq.com/{i}", " ".join(f"u{i}w{j}" for j in range(60)))
        for i in range(20)
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out_dir = str(tmp_path / "out")
    cfg = json.dumps({"band_cap": 4, "verify_estimate_gate": True})
    summary = run_dedup.main(
        ["--input", src, "--output", out_dir, "--mode", "cascade", "--fused",
         "--config-json", cfg]
    )
    acct = spark.read.parquet(os.path.join(out_dir, "tier_accounting"))
    metrics = {r["metric"] for r in acct.select("metric").distinct().collect()}
    assert "dropped_band" in metrics  # boilerplate bands over the cap
    assert "gated_pairs" in metrics  # gate accounting present even fused
    assert summary["accounting"]["dropped_band"]["rows"] > 0
    # dropped bands carry their size; the hot boilerplate bands hold 12 docs
    assert acct.where("metric = 'dropped_band'").agg({"n": "max"}).collect()[0][0] == 12


def test_cascade_mode_outputs_and_accounting(spark, tmp_path):
    out_dir = str(tmp_path / "casc")
    summary = run_dedup.main(["--output", out_dir, "--mode", "cascade", "--synth", "400"])
    assert summary["mode"] == "cascade"
    tiers = summary["tiers"]
    assert set(tiers) == {"exact", "near"}
    # accounting: chain of in/out is consistent and covers the corpus
    assert tiers["exact"]["in"] == summary["docs"]
    assert tiers["exact"]["out"] == tiers["near"]["in"]
    for t in tiers.values():
        assert t["in"] - t["dropped"] == t["out"]
    status = spark.read.parquet(os.path.join(out_dir, "status"))
    surv = spark.read.parquet(os.path.join(out_dir, "survivors"))
    tm = spark.read.parquet(os.path.join(out_dir, "tier_metrics"))
    assert status.count() == summary["docs"]
    assert surv.count() == tiers["near"]["out"]
    assert tm.count() == 2
    # every canonical names a surviving doc
    kept = status.where("tier = 'kept'").select("canonical_id")
    assert status.join(kept, "canonical_id", "left_anti").count() == 0


def test_train_fs_writes_params(spark, tmp_path):
    out_dir = str(tmp_path / "fs")
    summary = run_dedup.main(
        ["--output", out_dir, "--synth", "400", "--train-fs", "lang,len_bucket"]
    )
    params = {r["column"]: r for r in spark.read.parquet(
        os.path.join(out_dir, "fs_params")).collect()}
    assert set(params) == {"lang", "len_bucket"}
    for c, p in params.items():
        assert 0.0 < p["u"] < 1.0 and 0.0 < p["m"] < 1.0
        assert summary["fs_params"]["params"][c]["u"] == pytest.approx(p["u"], abs=1e-6)
    # single detector -> the per-rule table has exactly the minhash rule and
    # the averaged m equals that rule's m verbatim
    assert set(summary["fs_params"]["m_per_rule"]) == {"minhash"}
    for c in params:
        assert summary["fs_params"]["m_per_rule"]["minhash"][c] == pytest.approx(
            params[c]["m"], abs=1e-6
        )
    # duplicates are mutated copies (similar length -> same 256-char bucket
    # far more often than random pairs): len_bucket must be informative.
    # lang is i.i.d. random per synth doc, so it is a deliberate control —
    # structural checks only, m ≈ u is the EXPECTED outcome there.
    assert params["len_bucket"]["m"] > params["len_bucket"]["u"]


def test_train_fs_rejected_in_cascade_mode(tmp_path):
    with pytest.raises(SystemExit, match="union-mode option"):
        run_dedup.main(
            ["--output", str(tmp_path / "x"), "--mode", "cascade", "--synth", "50",
             "--train-fs", "host"]
        )


def test_train_fs_unknown_column_rejected(spark, tmp_path):
    with pytest.raises(SystemExit, match="not available"):
        run_dedup.main(
            ["--output", str(tmp_path / "y"), "--synth", "100", "--train-fs", "nope"]
        )


def test_train_fs_multi_detector_averages_m(spark, tmp_path):
    out_dir = str(tmp_path / "fs2")
    summary = run_dedup.main(
        ["--output", out_dir, "--synth", "400",
         "--detectors", "minhash,simhash", "--train-fs", "len_bucket"]
    )
    per_rule = summary["fs_params"]["m_per_rule"]
    # simhash may legitimately find zero pairs on a small corpus; minhash
    # always trains. Whatever rules trained, the stored m must equal the
    # plain average of the per-rule m values (the Splink averaging flow).
    assert "minhash" in per_rule
    ms = [per_rule[d]["len_bucket"] for d in per_rule]
    stored = {r["column"]: r["m"] for r in spark.read.parquet(
        os.path.join(out_dir, "fs_params")).collect()}
    assert stored["len_bucket"] == pytest.approx(sum(ms) / len(ms), abs=1e-6)
