"""Pallas PAR diffusion kernel: parity vs the jnp path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.ops.par import par_refine


def test_pallas_par_matches_jnp():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, 64, 64)).astype(np.float32))
    cam = jnp.asarray(rng.random((2, 5, 64, 64)).astype(np.float32))
    a = par_refine(img, cam, dilations=(1, 2, 4, 8), num_iter=3,
                   use_pallas=False)
    b = par_refine(img, cam, dilations=(1, 2, 4, 8), num_iter=3,
                   use_pallas="interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_valid_clamp_kernel_bit_identical():
    """par_diffuse_padded_valid == par_diffuse_padded + XLA clamp, bitwise,
    over multiple iterations and heterogeneous per-image extents (incl. a
    full-canvas image and border rows crossing row-tile boundaries)."""
    from excel_tpu.ops.par import (_clamp_valid_padded, _offsets,
                                   _replicate_valid)
    from excel_tpu.ops.par_pallas import (pad_for_diffuse,
                                          par_diffuse_padded,
                                          par_diffuse_padded_valid)

    rng = np.random.default_rng(2)
    b, c, h, w = 3, 5, 64, 128
    offs = tuple(_offsets((1, 2, 4, 8, 12, 24)))
    pad = 24
    masks = jnp.asarray(rng.random((b, c, h, w), np.float32)
                        ).astype(jnp.bfloat16)
    aff = jnp.asarray(rng.random((b, len(offs), h, w), np.float32)
                      / len(offs)).astype(jnp.bfloat16)
    valid = jnp.asarray([[h, w], [50, 100], [33, 77]], jnp.int32)
    mp = pad_for_diffuse(_replicate_valid(masks, valid), pad)

    m_old, m_new = mp, mp
    for _ in range(3):
        m_old = _clamp_valid_padded(
            par_diffuse_padded(m_old, aff, offs, h, w, interpret=True),
            valid, pad)
        m_new = par_diffuse_padded_valid(m_new, aff, valid, offs, h, w,
                                         interpret=True)
    assert np.array_equal(np.asarray(m_old, np.float32),
                          np.asarray(m_new, np.float32))


def test_pallas_par_valid_extent():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 3, 64, 64)).astype(np.float32))
    cam = jnp.asarray(rng.random((1, 4, 64, 64)).astype(np.float32))
    valid = jnp.asarray([[40, 30]], jnp.int32)
    a = par_refine(img, cam, dilations=(1, 2), num_iter=2,
                   valid_hw=valid, use_pallas=False)
    b = par_refine(img, cam, dilations=(1, 2), num_iter=2,
                   valid_hw=valid, use_pallas="interpret")
    np.testing.assert_allclose(np.asarray(a)[:, :, :40, :30],
                               np.asarray(b)[:, :, :40, :30], atol=1e-5)


def test_affinity_kernel_matches_xla():
    """par_affinity (fused one-pass kernel) == the XLA two-pass affinity
    (ops/par.py) after bf16 rounding, including the w2 position term."""
    from excel_tpu.ops.par import _offsets, _pos_weight, _shift
    from excel_tpu.ops.par_pallas import pad_for_diffuse, par_affinity

    rng = np.random.default_rng(3)
    b, h, w = 2, 64, 96
    dil = (1, 2, 4, 8, 12, 24)
    offs = _offsets(dil)
    k = len(offs)
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offs)
    w1, w2 = 0.3, 0.01
    imgs = jnp.asarray(rng.random((b, 3, h, w)).astype(np.float32))

    ip = jnp.pad(imgs, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    s1 = jnp.zeros_like(imgs)
    s2 = jnp.zeros_like(imgs)
    for dy, dx in offs:
        n = _shift(ip, dy, dx, h, w, pad)
        s1 = s1 + n
        s2 = s2 + n * n
    mean = s1 / k
    var = jnp.maximum(s2 / k - mean * mean, 0.0) * (k / (k - 1.0))
    inv = 1.0 / ((jnp.sqrt(var) + 1e-8) * w1)
    logits = jnp.stack(
        [(-jnp.square(jnp.abs(_shift(ip, dy, dx, h, w, pad) - imgs)
                      * inv)).mean(axis=1) for dy, dx in offs], axis=1)
    ref = (jax.nn.softmax(logits, axis=1)
           + w2 * jnp.asarray(_pos_weight(dil))[None, :, None, None])

    pos_w = tuple(float(x) for x in _pos_weight(dil))
    got = par_affinity(pad_for_diffuse(imgs, pad), tuple(offs), pos_w, h, w,
                       w1=w1, w2=w2, out_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=4e-3)
    # bf16 rounding is the only divergence: most entries bit-identical
    assert (np.asarray(got) == np.asarray(
        ref.astype(jnp.bfloat16))).mean() > 0.99


def test_resident_kernel_matches_iterated_valid_kernel():
    """The all-iterations VMEM-resident kernel must be bit-identical to
    iterating the per-iteration fused-valid kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from excel_tpu.ops.par import _offsets
    from excel_tpu.ops.par_pallas import (pad_for_diffuse,
                                          par_diffuse_padded_valid,
                                          par_diffuse_valid_resident)

    rng = np.random.default_rng(11)
    dil = (1, 8)
    offs = tuple(_offsets(dil))
    pad = 8
    b, c, h, w = 2, 3, 16, 40
    masks = jnp.asarray(rng.random((b, c, h, w), np.float32)
                        ).astype(jnp.bfloat16)
    aff = jnp.asarray((rng.random((b, len(offs), h, w), np.float32)
                       / len(offs))).astype(jnp.bfloat16)
    valid = jnp.asarray([[h, w], [11, 29]], jnp.int32)
    mp = pad_for_diffuse(masks, pad)

    it_out = mp
    for _ in range(3):
        it_out = par_diffuse_padded_valid(it_out, aff, valid, offs, h, w,
                                          interpret=True, tile_h=8)
    res_out = par_diffuse_valid_resident(mp, aff, valid, offs, h, w, 3,
                                         interpret=True, tile_h=8)
    np.testing.assert_array_equal(
        np.asarray(it_out[:, :, pad:pad + h, pad:pad + w], np.float32),
        np.asarray(res_out[:, :, pad:pad + h, pad:pad + w], np.float32))


def test_large_channel_count_groups_match_solo_runs():
    """COCO full-class widths (C>32) split into channel groups; each
    group's result must equal running that slice alone (channels diffuse
    independently given the affinity)."""
    import jax.numpy as jnp
    import numpy as np

    from excel_tpu.ops.par import par_refine

    rng = np.random.default_rng(7)
    b, c, h, w = 1, 40, 32, 40
    img = jnp.asarray(rng.random((b, 3, h, w)).astype(np.float32))
    cam = jnp.asarray(rng.random((b, c, h, w)).astype(np.float32))
    valid = jnp.asarray([[27, 33]], jnp.int32)
    kw = dict(dilations=(1, 8), num_iter=3, valid_hw=valid,
              use_pallas="interpret", dtype=jnp.bfloat16)
    full = par_refine(img, cam, **kw)
    lo = par_refine(img, cam[:, :32], **kw)
    hi = par_refine(img, cam[:, 32:], **kw)
    np.testing.assert_array_equal(np.asarray(full[:, :32]), np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(full[:, 32:]), np.asarray(hi))

    # force the resident-capacity split (production takes it when the
    # VMEM ping-pong canvas doesn't fit, e.g. C=9 at the 512x640 COCO
    # canvas -> balanced groups 5+4): results must be bitwise identical
    # to the unsplit run. par_refine's jit cache keys only on
    # shapes/statics, so it must be cleared around the patch (CLAUDE.md
    # round-3 ablation gotcha).
    from excel_tpu.ops import par as par_mod
    from excel_tpu.ops import par_pallas
    real = par_pallas.resident_tile_for

    def capped(mask_shape, *a, **k):
        return None if mask_shape[1] > 13 else real(mask_shape, *a, **k)

    par_mod.par_refine.clear_cache()
    par_pallas.resident_tile_for = capped
    try:
        split = par_refine(img, cam, **kw)
    finally:
        par_pallas.resident_tile_for = real
        par_mod.par_refine.clear_cache()
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))


def test_pad_replicate_valid_matches_composition():
    """pad_replicate_valid == pad_for_diffuse(_replicate_valid(x)) bitwise
    on every region the affinity/diffusion kernels read (rows/cols within
    the +-pad halo); the alignment slack regions differ by design
    (replicated border vs zero fill) and are never read.

    On-hardware note (round 4, 2026-08-19): real Mosaic on the v5e chip
    compiles and runs this kernel — verified non-interpret at the
    production eval shapes [4,3,384,512] and [2,5,384,512] bf16, pad=24,
    exact vs the XLA composition in the read region (the non-128-aligned
    lane concat the round-3 advisor flagged is accepted). The r3/r4 bench
    runs also exercise it in-pipeline (bench.py LAM at 384x512). The
    pad_clamp_fits guard was also validated on chip (round 4, 2026-08-20):
    an unguarded [_,9,480,640] bf16 call OOMs scoped VMEM on real Mosaic
    (22.62 MB stack vs the 16 MB limit) and the guard's conservative
    2x-live-set estimate (25.9 MB) rejects exactly such shapes — COCO
    canvases take the XLA pad composition in ops/par.run_group."""
    from excel_tpu.ops.par import _replicate_valid
    from excel_tpu.ops.par_pallas import (pad_clamp_fits, pad_for_diffuse,
                                          pad_replicate_valid)

    rng = np.random.default_rng(5)
    pad = 24
    # the measured-OOM shape ([_,9,480,640] bf16 = 22.62 MB kernel stack on
    # real Mosaic) must be rejected; the COCO channel-group shape is
    # borderline and conservatively rejected too (dtype-independent: the
    # guard takes the itemsize explicitly)
    assert not pad_clamp_fits((2, 9, 480, 640), pad, 2)
    assert not pad_clamp_fits((2, 5, 480, 640), pad, 2)
    for dtype in (jnp.float32, jnp.bfloat16):
        b, c, h, w = 3, 4, 64, 128
        x = jnp.asarray(rng.random((b, c, h, w), np.float32)).astype(dtype)
        valid = jnp.asarray([[h, w], [50, 100], [33, 77]], jnp.int32)
        assert pad_clamp_fits(x.shape, pad, x.dtype.itemsize)
        ref = pad_for_diffuse(_replicate_valid(x, valid), pad)
        got = pad_replicate_valid(x, valid, pad, interpret=True)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        read_w = w + 2 * pad          # kernels never read past the halo
        np.testing.assert_array_equal(
            np.asarray(ref[:, :, :h + 2 * pad, :read_w], np.float32),
            np.asarray(got[:, :, :h + 2 * pad, :read_w], np.float32))


def test_par_refine_valid_fused_pad_matches_xla_path():
    """End-to-end par_refine on a 128-aligned canvas (triggers the fused
    pad+clamp kernel) vs the pure-XLA path, inside the valid extents."""
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((2, 3, 64, 128)).astype(np.float32))
    cam = jnp.asarray(rng.random((2, 4, 64, 128)).astype(np.float32))
    valid = jnp.asarray([[40, 100], [64, 128]], jnp.int32)
    kw = dict(dilations=(1, 2, 4, 8, 12, 24), num_iter=2, valid_hw=valid)
    a = par_refine(img, cam, use_pallas=False, **kw)
    b = par_refine(img, cam, use_pallas="interpret", dtype=jnp.bfloat16,
                   **kw)
    for i, (vh, vw) in enumerate([[40, 100], [64, 128]]):
        np.testing.assert_allclose(
            np.asarray(a)[i, :, :vh, :vw], np.asarray(b)[i, :, :vh, :vw],
            atol=2e-2)
