"""JSONL corpus source: clean parse, corrupt-line quarantine, and the
degenerate all-corrupt / empty-file cases."""

from __future__ import annotations

import os
import tempfile

from btc_usdt_etl_pipeline_spark.sources.corpus import (
    read_jsonl_corpus,
    split_corrupt,
)


def _write(path: str, lines: list[str]) -> None:
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_clean_and_corrupt_split(spark):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "part-000.jsonl")
        _write(
            p,
            [
                '{"doc_id": 1, "text": "hello world", "lang": "en", '
                '"source": "s0", "n_chars": 11}',
                "this is not json at all",
                '{"doc_id": 2, "text": "bonjour", "lang": "fr", '
                '"source": "s1", "n_chars": 7}',
                '{"doc_id": 3, "text": "truncated',
            ],
        )
        good, bad = split_corrupt(read_jsonl_corpus(spark, p))
        rows = {r.doc_id: r for r in good.collect()}
        assert set(rows) == {1, 2}
        assert rows[1].text == "hello world" and rows[2].lang == "fr"
        assert "_corrupt_record" not in good.columns
        quarantined = [r._corrupt_record for r in bad.collect()]
        assert len(quarantined) == 2
        assert "not json" in quarantined[0] or "not json" in quarantined[1]


def test_jsonl_schema_drift_missing_fields_are_null(spark):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "drift.jsonl")
        _write(p, ['{"doc_id": 9, "text": "no lang field"}'])
        good, bad = split_corrupt(read_jsonl_corpus(spark, p))
        r = good.collect()[0]
        assert r.doc_id == 9 and r.lang is None and r.n_chars is None
        assert bad.count() == 0


def test_jsonl_empty_file(spark):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "empty.jsonl")
        open(p, "w").close()
        good, bad = split_corrupt(read_jsonl_corpus(spark, p))
        assert good.count() == 0 and bad.count() == 0
