"""Train-step smoke + schedule parity tests (tiny config, 8-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from excel_tpu.config import tiny_config
from excel_tpu.engine.train import (compiled_train_step, init_train_state,
                                    lr_schedule, phased_train_steps)
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import init_clip_params
from excel_tpu.parallel import make_mesh, pad_to_multiple, replicate, shard_batch


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    params = init_excel_params(key, cfg, clip_params)
    rng = np.random.default_rng(0)
    b = cfg.train.batch_size
    images = rng.integers(0, 256, (b, cfg.clip.image_size,
                                   cfg.clip.image_size, 3), dtype=np.uint8)
    cls = np.zeros((b, cfg.num_fg), np.float32)
    cls[:, :2] = 1.0
    text_attr = np.asarray(jax.random.normal(key, (cfg.num_fg + 3,
                                                   cfg.clip.embed_dim)))
    return cfg, clip_params, params, images, cls, text_attr


def test_lr_schedule_matches_reference():
    """PolyWarmupAdamW lr multipliers (utils/optimizer.py:52-63)."""
    cfg = tiny_config().train
    sched = lr_schedule(cfg)
    base = cfg.lr * 10.0

    def ref_mult(step):
        if step < cfg.warmup_iters:
            return 1 - (1 - step / cfg.warmup_iters) * (1 - cfg.warmup_ratio)
        return (1 - step / cfg.max_iters) ** cfg.power

    for step in [0, 1, 2, 5, 9]:
        np.testing.assert_allclose(
            float(sched(jnp.asarray(step))), base * ref_mult(step), rtol=1e-6)


@pytest.mark.slow
def test_train_step_runs_and_learns(setup):
    cfg, clip_params, params, images, cls, text_attr = setup
    state = init_train_state(params["head"], cfg.train)
    step_fn = compiled_train_step(cfg, calibrated=False, seg_affinity=False,
                                  donate=False)
    losses = []
    for i in range(3):
        state, metrics = step_fn(state, clip_params, jnp.asarray(images),
                                 jnp.asarray(cls), jnp.asarray(text_attr),
                                 jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 3
    # params actually moved
    d0 = params["head"]["classifier"]["w"]
    assert not np.allclose(np.asarray(d0), np.asarray(state.head["classifier"]["w"]))


@pytest.mark.slow
def test_all_phases_compile(setup):
    cfg, clip_params, params, images, cls, text_attr = setup
    steps = phased_train_steps(cfg)
    assert set(steps) == {(False, False), (True, False), (True, True)}
    for fn in steps.values():
        # phase steps donate the state buffer; give each phase its own copy
        head = jax.tree_util.tree_map(jnp.copy, params["head"])
        state = init_train_state(head, cfg.train)
        s2, metrics = fn(state, clip_params, jnp.asarray(images),
                         jnp.asarray(cls), jnp.asarray(text_attr),
                         jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_data_parallel_step_matches_single_device(setup):
    """Same batch, 8-way sharded vs unsharded: identical loss & updates."""
    cfg, clip_params, params, images, cls, text_attr = setup
    mesh = make_mesh()
    assert mesh.size == 8

    step_fn = compiled_train_step(cfg, calibrated=True, seg_affinity=True,
                                  donate=False)
    # unsharded
    s0 = init_train_state(params["head"], cfg.train)
    s1, m1 = step_fn(s0, clip_params, jnp.asarray(images), jnp.asarray(cls),
                     jnp.asarray(text_attr), jax.random.PRNGKey(0))
    # sharded
    sd = replicate(init_train_state(params["head"], cfg.train), mesh)
    cp = replicate(clip_params, mesh)
    ta = replicate(jnp.asarray(text_attr), mesh)
    im_d, cls_d = shard_batch((images, cls), mesh)
    s2, m2 = step_fn(sd, cp, im_d, cls_d, ta, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4),
        s1.head, s2.head)


def test_pad_to_multiple():
    batch = (np.arange(10).reshape(5, 2), np.ones((5,)))
    padded, valid = pad_to_multiple(batch, 8)
    assert padded[0].shape[0] == 8 and valid.sum() == 5
    same, valid2 = pad_to_multiple(batch, 5)
    assert same[0].shape[0] == 5 and valid2.all()


@pytest.mark.slow
def test_alternate_schedules_run(setup):
    import dataclasses
    cfg, clip_params, params, images, cls, text_attr = setup
    for kind in ("cos", "poly_sgd"):
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, schedule=kind))
        state = init_train_state(params["head"], c.train)
        fn = compiled_train_step(c, calibrated=False, seg_affinity=False,
                                 donate=False)
        state, metrics = fn(state, clip_params, jnp.asarray(images),
                            jnp.asarray(cls), jnp.asarray(text_attr),
                            jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"])), kind


@pytest.mark.slow
def test_train_step_class_slots_exact(setup):
    """A train step whose pseudo-label path refines only bg + class_slots
    present-class channels must produce the same metrics AND the same
    updated head as the full-channel step (the compaction mirrors the
    reference's present-classes-only refinement)."""
    cfg, clip_params, params, images, cls, text_attr = setup
    cls_var = np.zeros_like(cls)
    cls_var[0, [0]] = 1.0
    cls_var[1:, [1, 3]] = 1.0              # batch max cardinality = 2

    def run(slots):
        head = jax.tree_util.tree_map(jnp.copy, params["head"])
        state = init_train_state(head, cfg.train)
        fn = compiled_train_step(cfg, calibrated=True, seg_affinity=True,
                                 donate=False, class_slots=slots)
        state, metrics = fn(state, clip_params, jnp.asarray(images),
                            jnp.asarray(cls_var), jnp.asarray(text_attr),
                            jax.random.PRNGKey(7))
        return state, {k: float(v) for k, v in metrics.items()}

    ref_state, ref_metrics = run(None)
    for slots in (2, 4):
        st, m = run(slots)
        assert m == ref_metrics, (slots, m, ref_metrics)
        for a, b in zip(jax.tree_util.tree_leaves(ref_state.head),
                        jax.tree_util.tree_leaves(st.head)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_cache_buckets(setup):
    """TrainStepCache picks the smallest covering bucket and reuses
    compiled steps."""
    from excel_tpu.engine.train import TrainStepCache

    cfg, *_ = setup
    cache = TrainStepCache(cfg, buckets=(2, 4))
    cls = np.zeros((4, cfg.num_fg), np.float32)
    cls[:, 0] = 1.0
    assert cache.slots_for(cls) == 2
    cls[0, :3] = 1.0
    assert cache.slots_for(cls) == 4
    cls[0, :] = 1.0
    assert cache.slots_for(cls) is None    # over the largest bucket
    fn1 = cache((False, False), np.eye(1, cfg.num_fg, dtype=np.float32))
    fn2 = cache((False, False), np.eye(1, cfg.num_fg, dtype=np.float32))
    assert fn1 is fn2
