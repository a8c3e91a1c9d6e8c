"""Tests for the model-based quality scorer (datapipe.quality_model):
weights artifact round-trip, actor-pool scoring, block-layout
invariance, and exact-integer logit semantics."""

import numpy as np
import pyarrow as pa


def _ds(tbl: pa.Table):
    import ray.data as rd
    return rd.from_arrow(tbl)


def test_model_quality_deterministic_and_blocking_invariant():
    from sagan_ray.datapipe.quality_model import model_quality

    texts = ["the cat sat", "", "hello world hello", "zq zq zq zq"] * 8
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    a = (model_quality(_ds(tbl), seed=23, concurrency=2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (model_quality(_ds(tbl).repartition(5), seed=23, concurrency=2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    # identical texts get identical scores; empty text scores sigmoid(0)
    assert a.loc[0, "logit_q"] == a.loc[4, "logit_q"]
    assert a.loc[1, "n_words"] == 0 and a.loc[1, "model_quality"] == 0.5
    assert ((a["model_quality"] > 0) & (a["model_quality"] < 1)).all()


def test_weights_artifact_is_deterministic(tmp_path):
    from sagan_ray.datapipe.quality_model import write_quality_model

    p1 = write_quality_model(seed=23, path=str(tmp_path / "a.npz"))
    p2 = write_quality_model(seed=23, path=str(tmp_path / "b.npz"))
    w1, w2 = np.load(p1)["w"], np.load(p2)["w"]
    assert np.array_equal(w1, w2)
    assert w1.dtype == np.int64 and len(w1) == 1 << 16
    # different seed -> different weights
    p3 = write_quality_model(seed=24, path=str(tmp_path / "c.npz"))
    assert not np.array_equal(w1, np.load(p3)["w"])
