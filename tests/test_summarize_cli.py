"""scripts/summarize_dtu.py CLI: re-scores BOTH bundle families — the
offline results_all_iter_*.msgpack (scripts/inference.py:124) and the
in-training validation-iter_*.msgpack (training/validate.py) — into one
CSV (reference scripts/summarize_dtu.py:48-79; the reference's
filename-mismatch bug is avoided by globbing)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from flax import serialization

REPO = Path(__file__).resolve().parents[1]


def _bundle(seed, S=2, bs=3, h=16, w=20):
    rng = np.random.RandomState(seed)
    gt = rng.rand(bs, h, w, 3).astype(np.float32)
    preds = np.clip(gt[None] + 0.05 * rng.randn(S, bs, h, w, 3), 0,
                    1).astype(np.float32)
    masks = np.ones((bs, h, w, 1), np.float32)
    return {"imgs_pred": preds, "imgs_gt": gt, "masks": masks,
            "metrics": {}, "seeds": np.arange(S)}


@pytest.fixture(scope="module")
def result_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu_results")
    offline = root / "scan1"
    offline.mkdir()
    (offline / "results_all_iter_100.msgpack").write_bytes(
        serialization.msgpack_serialize(_bundle(0)))
    intrain = root / "scan2"
    intrain.mkdir()
    (intrain / "validation-iter_100-denoisesteps_5_numseeds_2.msgpack"
     ).write_bytes(serialization.msgpack_serialize(_bundle(1)))
    # decoy PNGs sharing the validation-iter_ prefix (the t2i sheets land
    # in the same dir; ADVICE r3 — the glob must not pick them up)
    (intrain / "validation-iter_100-denoisesteps_5_imgs_t2i_0.png"
     ).write_bytes(b"\x89PNG not a bundle")
    return offline, intrain


def _run(dirs, out, extra=()):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / "summarize_dtu.py"),
         "--results_dirs", *map(str, dirs), "--iteration", "100",
         "--out", str(out), *extra],
        capture_output=True, text=True, timeout=600, cwd=str(REPO))


def test_summarizes_both_bundle_families(result_dirs, tmp_path):
    import pandas as pd
    out = tmp_path / "summary.csv"
    r = _run(result_dirs, out)
    assert r.returncode == 0, r.stderr[-2000:]
    df = pd.read_csv(out)
    # 2 scans x 2 seeds, both families found
    assert sorted(df["scan"].unique()) == ["scan1", "scan2"]
    assert len(df) == 4
    assert (df["psnr"] > 10).all()          # preds are near-GT
    assert (df["ssim"] > 0.3).all()
    assert (df["lpips"] == 0).all()         # lpips off by default


def test_warns_on_missing_bundle(result_dirs, tmp_path):
    missing = tmp_path / "scan_empty"
    missing.mkdir()
    r = _run([missing], tmp_path / "s.csv")
    assert "no results bundle" in r.stdout + r.stderr


def test_scores_all_bundles_in_a_dir(tmp_path):
    """Mode-3 runs save one bundle per eval token; ALL must be scored,
    not just the alphabetically-first (ADVICE r3)."""
    import pandas as pd
    d = tmp_path / "scan3"
    d.mkdir()
    for tok in ("tokenA", "tokenB"):
        (d / f"validation-iter_100-{tok}_numseeds_2.msgpack").write_bytes(
            serialization.msgpack_serialize(_bundle(2)))
    out = tmp_path / "s.csv"
    r = _run([d], out)
    assert r.returncode == 0, r.stderr[-2000:]
    df = pd.read_csv(out)
    assert len(df) == 4                         # 2 bundles x 2 seeds
    assert sorted(df["bundle"].str.contains("tokenA")) == [
        False, False, True, True]
