"""CLI end-to-end smoke (tiny synthetic) + checkpoint round-trips."""
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import tiny_config
from excel_tpu.engine.checkpoint import (latest_checkpoint, load_head_npz,
                                         restore_checkpoint, save_checkpoint,
                                         save_head_npz)
from excel_tpu.engine.train import init_train_state
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import init_clip_params


def _tree_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_excel_params(jax.random.PRNGKey(0), cfg,
                               init_clip_params(jax.random.PRNGKey(0),
                                                cfg.clip))
    state = init_train_state(params["head"], cfg.train)
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    ckpt_dir = str(tmp_path / "ckpts")
    path = save_checkpoint(ckpt_dir, state)
    assert latest_checkpoint(ckpt_dir) == path

    template = init_train_state(
        init_excel_params(jax.random.PRNGKey(1), cfg,
                          init_clip_params(jax.random.PRNGKey(1),
                                           cfg.clip))["head"], cfg.train)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 7
    _tree_equal(restored.head, state.head)
    _tree_equal(restored.opt_state, state.opt_state)


def test_head_npz_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_excel_params(jax.random.PRNGKey(0), cfg,
                               init_clip_params(jax.random.PRNGKey(0),
                                                cfg.clip))
    path = str(tmp_path / "head.npz")
    save_head_npz(path, params["head"])
    other = init_excel_params(jax.random.PRNGKey(5), cfg,
                              init_clip_params(jax.random.PRNGKey(5),
                                               cfg.clip))["head"]
    loaded = load_head_npz(path, other)
    _tree_equal(loaded, params["head"])


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    from excel_tpu.cli.train import main
    work = str(tmp_path / "run")
    main(["--tiny", "--synthetic", "4", "--random-init", "--work-dir", work,
          "--max-iters", "2", "--eval-iters", "2", "--log-iters", "1",
          "--batch-size", "4"])
    assert os.path.exists(os.path.join(work, "head_2.npz"))
    assert latest_checkpoint(os.path.join(work, "checkpoints"))
    # resume continues from the checkpoint
    main(["--tiny", "--synthetic", "4", "--random-init", "--work-dir", work,
          "--max-iters", "4", "--eval-iters", "4", "--log-iters", "1",
          "--batch-size", "4", "--resume", "--no-eval"])
    assert os.path.exists(os.path.join(work, "head_4.npz"))


@pytest.mark.slow
def test_infer_cli_smoke(tmp_path):
    from excel_tpu.cli.infer_lam import main as lam_main
    from excel_tpu.cli.infer_seg import main as seg_main
    work = str(tmp_path / "run")
    scores = lam_main(["--tiny", "--synthetic", "3", "--random-init",
                       "--work-dir", work, "--training-free",
                       "--batch-size", "3"])
    assert 0.0 <= scores["miou"] <= 1.0
    scores = seg_main(["--tiny", "--synthetic", "3", "--random-init",
                       "--work-dir", work, "--scales", "1.0",
                       "--batch-size", "3"])
    assert 0.0 <= scores["miou"] <= 1.0
