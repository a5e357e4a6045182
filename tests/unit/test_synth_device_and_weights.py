import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.data.synth_device import (
    synth_batch_iter,
    synth_pair_batch,
)
from low_light_image_enhancement_tpu.models.curve_cnn import init_curve_cnn
from low_light_image_enhancement_tpu.models.weights import (
    PRETRAINED,
    load_params,
    load_pretrained,
    save_params,
)


def test_synth_pair_batch_properties():
    low, high = synth_pair_batch(jax.random.PRNGKey(0), 2, 24, 32)
    assert low.shape == high.shape == (2, 3, 24, 32)
    assert float(low.min()) >= 0.0 and float(high.max()) <= 1.0
    # low-light: much darker than ground truth
    assert float(low.mean()) < float(high.mean()) * 0.5
    # jittable
    jitted = jax.jit(lambda k: synth_pair_batch(k, 2, 16, 16))
    jitted(jax.random.PRNGKey(1))


def test_synth_batch_iter_distinct_batches():
    it = synth_batch_iter(2, 16, 16, seed=0)
    (l1, _), (l2, _) = next(it), next(it)
    assert float(jnp.abs(l1 - l2).max()) > 0


def test_save_load_params_roundtrip(tmp_path):
    params = init_curve_cnn(jax.random.PRNGKey(0), features=8, n_iter=2)
    p = tmp_path / "w.npz"
    save_params(params, p)
    back = load_params(p)
    assert set(back) == set(params)
    for layer in params:
        for k in params[layer]:
            np.testing.assert_array_equal(
                np.asarray(params[layer][k]), back[layer][k]
            )


def test_pipeline_uses_pretrained_when_compatible(tmp_path, monkeypatch):
    from low_light_image_enhancement_tpu.config import PipelineConfig
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

    params = init_curve_cnn(jax.random.PRNGKey(7), features=32, n_iter=8)
    wpath = tmp_path / "curve_cnn.npz"
    save_params(params, wpath)
    monkeypatch.setitem(PRETRAINED, "curve", wpath)

    pipe = EnhancePipeline(PipelineConfig(method="curve"))
    np.testing.assert_array_equal(
        np.asarray(pipe.model_params["c1"]["w"]),
        np.asarray(params["c1"]["w"]),
    )
    # incompatible config falls back to fresh init (different shape)
    pipe2 = EnhancePipeline(PipelineConfig(method="curve", curve_iters=4))
    assert pipe2.model_params["c7"]["w"].shape[-1] == 12


def test_load_pretrained_missing_returns_none(monkeypatch, tmp_path):
    monkeypatch.setitem(PRETRAINED, "fcn", tmp_path / "nope.npz")
    assert load_pretrained("fcn") is None
    assert load_pretrained("unknown-method") is None


def test_all_shipped_weight_paths_live_in_the_package():
    """Regression for the round-3 zeroref ship bug: the re-swept winner was
    committed to a stray top-level weights/ dir while NAMED['zeroref'] kept
    loading a stale package file. Every shipped name must resolve to an
    EXISTING .npz inside the package weights dir, and no stray repo-root
    weights/ dir may shadow it."""
    from pathlib import Path

    from low_light_image_enhancement_tpu.models.weights import (
        _WEIGHTS_DIR,
        NAMED,
    )

    pkg_root = Path(_WEIGHTS_DIR).resolve().parent
    assert pkg_root.name == "low_light_image_enhancement_tpu"
    for name, path in NAMED.items():
        p = Path(path).resolve()
        assert p.parent == Path(_WEIGHTS_DIR).resolve(), (name, p)
        assert p.exists(), f"shipped weights missing: {name} -> {p}"
        load_params(p)  # loads and parses
    repo_root = pkg_root.parent
    assert not (repo_root / "weights").exists(), (
        "stray repo-root weights/ dir shadows the package weights"
    )
