import json

import numpy as np

from low_light_image_enhancement_tpu.utils.logging import JSONLLogger
from low_light_image_enhancement_tpu.utils.checkpoint import CheckpointManager


def test_jsonl_logger_roundtrip(tmp_path):
    p = tmp_path / "m" / "run.jsonl"
    lg = JSONLLogger(p)
    lg.log({"loss": 1.5}, step=1)
    lg.log({"loss": 0.5}, step=2)
    recs = lg.read()
    assert len(recs) == 2
    assert recs[0]["loss"] == 1.5 and recs[0]["step"] == 1
    assert "time" in recs[1]
    # file is valid JSONL
    lines = p.read_text().strip().split("\n")
    assert all(json.loads(line) for line in lines)


def test_checkpoint_save_restore(tmp_path):
    import jax.numpy as jnp

    state = {"params": {"w": jnp.arange(4.0)}, "step": 3}
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    mgr.save(state, step=3, wait=True)
    assert mgr.latest_step() == 3
    template = {"params": {"w": jnp.zeros(4)}, "step": 0}
    restored = mgr.restore_latest(template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(4.0))
    assert int(restored["step"]) == 3
    mgr.save({"params": {"w": jnp.ones(4)}, "step": 5}, step=5, wait=True)
    assert mgr.latest_step() == 5
    mgr.close()
