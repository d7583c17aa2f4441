"""End-to-end pin for scripts/curation_job.py: the composed curation
pipeline writes a split-partitioned curated corpus whose rows agree
with the individually-gated ops it composes."""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_curation_job_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import curation_job

    out = str(tmp_path / "curated")
    rc = curation_job.main(["--input", SF, "--output", out])
    assert rc == 0

    stats = json.load(open(os.path.join(out, "stats.json")))
    assert stats["input_docs"] == 500
    assert stats["kept_docs"] == sum(stats["by_split"].values())
    assert stats["kept_docs"] == stats["by_reason"].get("keep", 0)
    assert stats["kept_docs"] < stats["input_docs"]  # something drops
    assert stats["n_shards"] >= 2

    df = spark.read.parquet(os.path.join(out, "docs"))
    rows = df.collect()
    assert len(rows) == stats["kept_docs"]
    # split-partitioned layout on disk
    parts = {d for d in os.listdir(os.path.join(out, "docs"))
             if d.startswith("split=")}
    assert parts == {f"split={s}" for s in stats["by_split"]}

    # agreement with the gated component ops
    from swish_e_spark.ops import classify, weburl

    dec = {r.doc_id: r.reason
           for r in weburl.curation_decisions(spark, SF).collect()}
    nb = {r.doc_id: r.nb_score
          for r in classify.quality_nb_scores(spark, SF).collect()}
    spl = {r.doc_id: r.split
           for r in classify.leakage_safe_splits(spark, SF).collect()}
    for r in rows:
        assert dec[r.doc_id] == "keep"
        assert nb[r.doc_id] >= -0.5
        assert spl[r.doc_id] == r.split
        # PII never survives into the curated text
        assert not re.search(weburl.EMAIL_RE, r.text)
        assert not re.search(weburl.PHONE_RE, r.text)
    # every drop is accounted for by a reason
    dropped = stats["input_docs"] - stats["kept_docs"]
    assert dropped == sum(n for k, n in stats["by_reason"].items()
                          if k != "keep")
