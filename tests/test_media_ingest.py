"""Round-2 media/ingest surfaces: q84 bigram-LM fluency semantics,
q85 audio featurization physics, q86 binaryFile ingest fidelity.

(q84's bit-exact DuckDB parity is covered by test_oracle_parity; here
we pin the *semantics* — that the score actually separates fluent text
from word salad — against a hand-built corpus.)
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from voz_spark import synth
from voz_spark.codec import decode_image
from voz_spark.corpus_ops import q84_bigram_fluency
from voz_spark.dataprep import _AUDIO_SR, q85_audio_features, synth_audio_pcm
from voz_spark.storage import q86_binaryfile_ingest


# --- q84 bigram fluency ------------------------------------------------------


def _write_documents(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "test", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def test_bigram_fluency_separates_salad_from_fluent(spark, tmp_path):
    """Same unigram bag, different transitions: the shuffled doc must
    score strictly lower fluency than docs made of corpus-common
    transitions (this is what unigram rarity q82 cannot see)."""
    fluent = "the quick brown fox jumps over the lazy dog " * 6
    # word salad: identical vocabulary, adjacencies that appear nowhere else
    salad = "fox the dog quick lazy brown the jumps over dog fox quick " * 3
    sf = _write_documents(spark, tmp_path, [fluent, fluent, fluent, salad])
    out = {r["doc_id"]: r for r in q84_bigram_fluency(spark, sf).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[3]["fluency"] < out[0]["fluency"]
    for r in out.values():
        assert 0.0 < r["fluency"] <= 1.0
        assert r["n_bigrams"] >= 1


def test_bigram_fluency_single_token_docs_excluded(spark, tmp_path):
    sf = _write_documents(spark, tmp_path, ["hello", "a b a b a b"])
    got = q84_bigram_fluency(spark, sf).collect()
    assert [r["doc_id"] for r in got] == [1]


# --- q85 audio features ------------------------------------------------------


def test_audio_features_match_sine_physics(spark, sf_dir):
    pdf = q85_audio_features(spark, sf_dir).toPandas()
    assert len(pdf) == 256
    ok = pdf[pdf.status == "ok"].set_index("audio_id")
    stub = pdf[pdf.status == "decode_unsupported"]
    # every 7th row is the compressed-format stub path
    assert len(stub) == len([i for i in range(256) if i % 7 == 0])
    assert stub[["duration_s", "rms", "peak", "zcr", "dom_freq_hz"]].isna().all().all()
    for i in (1, 2, 3, 5, 10):
        pcm, freq, amp, n = synth_audio_pcm(i)
        r = ok.loc[f"clip_{i:05d}"]
        assert r["duration_s"] == round(n / _AUDIO_SR, 6)
        # pure sine: RMS = amp/sqrt(2), ZCR = 2f/sr, peak ~= amp
        assert abs(r["rms"] - amp / math.sqrt(2)) < 1e-3
        assert abs(r["zcr"] - 2 * freq / _AUDIO_SR) < 2e-3
        assert abs(r["peak"] - amp) < 1e-3
        assert r["dom_freq_hz"] == freq  # Goertzel picks the true tone


# --- q86 binaryFile ingest ---------------------------------------------------


def test_binaryfile_ingest_decodes_every_file_exactly(spark, sf_dir):
    from voz_spark.storage import binaryfile_decode_ingest

    pdf = binaryfile_decode_ingest(spark, sf_dir).toPandas()
    assert len(pdf) == 64
    assert (pdf["status"] == "ok").all()
    assert list(pdf["image_id"]) == sorted(pdf["image_id"])
    by_id = pdf.set_index("image_id")
    for i in (0, 1, 7):
        r = synth.image_row(i)
        got = by_id.loc[r["image_id"]]
        assert got["fmt"] == r["fmt"]
        assert (got["w"], got["h"]) == (r["w"], r["h"])
        assert got["file_len"] == len(r["bytes"])
        px = decode_image(r["bytes"], r["fmt"]).astype(np.float64)
        assert got["mean_px"] == pytest.approx(round(px.mean(), 6), abs=1e-9)


def test_binaryfile_manifest_is_hash_exact(spark, sf_dir):
    """q86 (the registered, oracled surface) returns the ingest
    manifest; every row's md5-of-uppercase-hex matches a local
    hashlib replay of the generator bytes."""
    import hashlib

    pdf = q86_binaryfile_ingest(spark, sf_dir).toPandas()
    assert len(pdf) == 64
    assert list(pdf["image_id"]) == sorted(pdf["image_id"])
    by_id = pdf.set_index("image_id")
    for i in (0, 1, 7, 63):
        r = synth.image_row(i)
        got = by_id.loc[r["image_id"]]
        assert got["fmt"] == r["fmt"]
        assert got["file_len"] == len(r["bytes"])
        want = hashlib.md5(r["bytes"].hex().upper().encode()).hexdigest()
        assert got["content_md5"] == want
