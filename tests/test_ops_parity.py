"""Golden parity of the JAX ops layer against the reference torch+cv2 code.

Each test runs the actual reference function (imported in place from
/root/reference, cv2 and torch on CPU) and our fixed-shape JAX equivalent on
the same random inputs.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from excel_tpu.ops.affinity import (aggregate_attn, compute_trans_mat,
                                    refine_lams, scoremap_box_mask)
from excel_tpu.ops.labels import (affinity_label, cams_with_background,
                                  lam_to_label, radius_mask)
from excel_tpu.ops.par import par_refine
from excel_tpu.ops.surgery import clip_feature_surgery
from excel_tpu.ops.tse import attr_aggregate

from ref_oracle import REF, load_ref_module

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# feature surgery (clip/clip.py:288-310)
# ---------------------------------------------------------------------------

def _ref_feature_surgery(torch, img, txt):
    """Reference clip_feature_surgery math, run in torch (the function lives
    inside clip/clip.py whose module imports pull in model downloads; the
    math is 8 lines — reproduced per clip/clip.py:288-310 as the oracle)."""
    image_features = torch.from_numpy(img)
    text_features = torch.from_numpy(txt)
    prob = image_features[:, :1, :] @ text_features.t()
    prob = (prob * 2).softmax(-1)
    w = prob / prob.mean(-1, keepdim=True)
    b, n_t, n_i, c = (image_features.shape[0], text_features.shape[0],
                      image_features.shape[1], image_features.shape[2])
    feats = image_features.reshape(b, n_i, 1, c) * text_features.reshape(1, 1, n_t, c)
    feats = feats * w.unsqueeze(-1)
    redundant_feats = feats.mean(2, keepdim=True)
    feats = feats - redundant_feats
    similarity = feats.sum(-1)
    attr_maps = ((similarity - similarity.min(1, keepdim=True)[0])
                 / (similarity.max(1, keepdim=True)[0]
                    - similarity.min(1, keepdim=True)[0]))
    return attr_maps.numpy()


def test_feature_surgery_matches_materialized_form(torch):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 26, 32)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt = rng.normal(size=(9, 32)).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    ref = _ref_feature_surgery(torch, img, txt)
    mine = clip_feature_surgery(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# TSE attribute aggregation (model/load_attr.py:86-120)
# ---------------------------------------------------------------------------

def test_attr_aggregate_parity(torch):
    monkey_cwd = os.getcwd()
    os.chdir(REF)
    sys_path_added = REF not in __import__("sys").path
    if sys_path_added:
        __import__("sys").path.insert(0, REF)
    try:
        load_attr = load_ref_module("model/load_attr.py", "load_attr")
        rng = np.random.default_rng(1)
        text = rng.normal(size=(45, 512)).astype(np.float32)
        text /= np.linalg.norm(text, axis=-1, keepdims=True)
        ref_agg, _ = load_attr.attr_aggregate(
            torch.from_numpy(text), "pascal_voc", num_classes=20,
            num_atrr_clusters=112)
        ref_agg = ref_agg.numpy().T        # reference returns [C, T]

        bank_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets", "attributes", "pascal_voc_bank_112.npz")
        bank = np.load(bank_path)["cluster_bank"]
        mine = attr_aggregate(jnp.asarray(text), jnp.asarray(bank), num_fg=20)
        np.testing.assert_allclose(np.asarray(mine), ref_agg,
                                   atol=2e-5, rtol=1e-4)
    finally:
        os.chdir(monkey_cwd)


# ---------------------------------------------------------------------------
# SVC (utils/affutils.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def affutils():
    return load_ref_module("utils/affutils.py", "affutils")


def test_compute_trans_mat_parity(torch, affutils):
    rng = np.random.default_rng(2)
    attn = rng.uniform(0.01, 1.0, size=(100, 100)).astype(np.float32)
    ref = affutils.compute_trans_mat(torch.from_numpy(attn)).numpy()
    mine = compute_trans_mat(jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-5, rtol=1e-4)


def _box_mask_ref(affutils, score, thr):
    box, cnt = affutils.scoremap2bbox(score, thr, multi_contour_eval=True)
    mask = np.zeros_like(score)
    for i in range(cnt):
        x0, y0, x1, y1 = box[i]
        mask[y0:y1, x0:x1] = 1
    return mask


@pytest.mark.parametrize("seed", range(8))
def test_scoremap_box_mask_parity(affutils, seed):
    rng = np.random.default_rng(seed)
    h = w = 20
    # synthesize blobby score maps like min-max-normed LAMs
    pts = rng.uniform(0, 20, size=(3, 2))
    yy, xx = np.mgrid[0:h, 0:w]
    score = np.zeros((h, w), dtype=np.float32)
    for (cy, cx) in pts:
        score += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                        / rng.uniform(4, 40))
    score = (score - score.min()) / (score.max() - score.min())
    for thr in (0.4, 0.79, 0.88):
        ref = _box_mask_ref(affutils, score, thr)
        mine = np.asarray(scoremap_box_mask(jnp.asarray(score), thr))
        np.testing.assert_array_equal(mine, ref,
                                      err_msg=f"seed={seed} thr={thr}")


def test_scoremap_box_mask_zero_map(affutils):
    score = np.zeros((20, 20), dtype=np.float32)
    ref = _box_mask_ref(affutils, score, 0.79)
    mine = np.asarray(scoremap_box_mask(jnp.asarray(score), 0.79))
    np.testing.assert_array_equal(mine, ref)


def test_refine_cams_with_aff_parity(torch, affutils):
    rng = np.random.default_rng(3)
    h = w = 320
    gh = gw = h // 16
    n = gh * gw + 1
    layers = 12
    attn_weights = rng.uniform(0.01, 1.0, size=(layers, n, n)).astype(np.float32)
    lams = rng.uniform(0, 1, size=(n, 20)).astype(np.float32)
    cls_label = np.zeros(20, dtype=np.float32)
    cls_label[[3, 11, 17]] = 1

    ref_list, cls_lst = affutils.refine_cams_with_aff(
        torch.from_numpy(lams[1:]), torch.from_numpy(attn_weights),
        torch.from_numpy(cls_label), (h, w), caa_thre=0.79, attn_layers=6)
    ref = np.stack([r.numpy() for r in ref_list])

    agg = aggregate_attn(jnp.asarray(attn_weights), attn_layers=6)
    mine = refine_lams(jnp.asarray(lams[1:].T), agg, 0.79, (gh, gw))
    mine = np.asarray(mine).reshape(20, gh, gw)[cls_label.astype(bool)]
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=1e-3)


def test_refine_cams_with_aff_seg_attn_parity(torch, affutils):
    rng = np.random.default_rng(4)
    h = w = 320
    gh = gw = h // 16
    n = gh * gw + 1
    attn_weights = rng.uniform(0.01, 1.0, size=(12, n, n)).astype(np.float32)
    seg_attn = rng.uniform(0.01, 1.0, size=(gh * gw, gh * gw)).astype(np.float32)
    lams = rng.uniform(0, 1, size=(n, 20)).astype(np.float32)
    cls_label = np.zeros(20, dtype=np.float32)
    cls_label[[0, 7]] = 1

    ref_list, _ = affutils.refine_cams_with_aff(
        torch.from_numpy(lams[1:]), torch.from_numpy(attn_weights),
        torch.from_numpy(cls_label), (h, w), caa_thre=0.79, attn_layers=6,
        seg_attn=torch.from_numpy(seg_attn))
    ref = np.stack([r.numpy() for r in ref_list])

    agg = aggregate_attn(jnp.asarray(attn_weights), 6, jnp.asarray(seg_attn))
    mine = refine_lams(jnp.asarray(lams[1:].T), agg, 0.79, (gh, gw))
    mine = np.asarray(mine).reshape(20, gh, gw)[cls_label.astype(bool)]
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# PAR (utils/PAR.py)
# ---------------------------------------------------------------------------

def test_par_parity(torch):
    PARmod = load_ref_module("utils/PAR.py", "PAR")
    rng = np.random.default_rng(5)
    imgs = rng.uniform(0, 255, size=(2, 3, 48, 48)).astype(np.float32)
    masks = rng.uniform(0, 1, size=(2, 4, 48, 48)).astype(np.float32)
    par = PARmod.PAR(dilations=[1, 2, 4, 8, 12], num_iter=10)
    with torch.no_grad():
        ref = par(torch.from_numpy(imgs), torch.from_numpy(masks)).numpy()
    mine = par_refine(jnp.asarray(imgs), jnp.asarray(masks),
                      dilations=(1, 2, 4, 8, 12), num_iter=10)
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# label utilities (utils/camutils.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def camutils():
    return load_ref_module("utils/camutils.py", "camutils")


def test_lam_to_label_parity(torch, camutils):
    rng = np.random.default_rng(6)
    cam = rng.uniform(0, 1, size=(2, 5, 16, 16)).astype(np.float32)
    cls = (rng.uniform(size=(2, 5)) > 0.5).astype(np.float32)
    cls[:, 0] = 1
    ref_valid, ref_label = camutils.lam_to_label(
        torch.from_numpy(cam), torch.from_numpy(cls), bkg_thre=0.5)
    valid, label = lam_to_label(jnp.asarray(cam), jnp.asarray(cls),
                                bkg_thre=0.5)
    np.testing.assert_allclose(np.asarray(valid), ref_valid.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(label), ref_label.numpy())

    ref_valid, ref_label = camutils.lam_to_label(
        torch.from_numpy(cam), torch.from_numpy(cls), high_thre=0.7,
        low_thre=0.25, ignore_mid=True, ignore_index=255)
    valid, label = lam_to_label(jnp.asarray(cam), jnp.asarray(cls),
                                high_thre=0.7, low_thre=0.25, ignore_mid=True)
    np.testing.assert_array_equal(np.asarray(label), ref_label.numpy())


def test_radius_mask_parity(camutils):
    ref = camutils.get_mask_by_radius(h=12, w=15, radius=4)
    mine = radius_mask(12, 15, 4)
    np.testing.assert_array_equal(np.asarray(mine), ref)


def test_affinity_label_parity(torch, camutils):
    rng = np.random.default_rng(7)
    label = rng.integers(0, 4, size=(2, 64, 64)).astype(np.float32)
    label[0, :8] = 255
    mask = camutils.get_mask_by_radius(h=4, w=4, radius=2)
    ref = camutils.cams_to_affinity_label(
        torch.from_numpy(label), mask=torch.from_numpy(mask),
        ignore_index=255).numpy()
    mine = affinity_label(jnp.asarray(label.astype(np.int32)),
                          mask=radius_mask(4, 4, 2), downscale=16)
    np.testing.assert_array_equal(np.asarray(mine), ref)


def test_cams_with_background_matches_reference_pipeline(torch, affutils):
    """generate_cam_label + bg concat (affutils.py:55-67,161-166) on present
    classes == our fixed-shape masked version on the present rows."""
    rng = np.random.default_rng(8)
    refined = rng.normal(size=(1, 6, 20, 20)).astype(np.float32)
    cls_label = np.array([[1, 0, 1, 1, 0, 1]], dtype=np.float32)
    present = cls_label[0].astype(bool)

    cam_list = [torch.from_numpy(refined[0, i]) for i in
                np.flatnonzero(present)]
    ref_cams = affutils.generate_cam_label(cam_list, 64, 64)
    bg = torch.pow(1 - torch.max(ref_cams, dim=0, keepdims=True)[0], 1.0)
    ref_stack = torch.cat([bg, ref_cams], dim=0).numpy()

    mine = cams_with_background(jnp.asarray(refined), jnp.asarray(cls_label),
                                (64, 64))
    mine = np.asarray(mine)[0]
    sel = np.concatenate([[0], 1 + np.flatnonzero(present)])
    np.testing.assert_allclose(mine[sel], ref_stack, atol=2e-3, rtol=1e-3)


def test_get_similarity_map_parity(torch):
    clip_ref = load_ref_module("clip/clip.py", "_sim_clip")
    from excel_tpu.ops.surgery import get_similarity_map
    rng = np.random.default_rng(0)
    sm = rng.random((2, 16, 5)).astype(np.float32)
    ref = clip_ref.get_similarity_map(torch.from_numpy(sm), (24, 30)).numpy()
    mine = np.asarray(get_similarity_map(jnp.asarray(sm), (24, 30)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_similarity_map_to_points_parity(torch):
    clip_ref = load_ref_module("clip/clip.py", "_pts_clip")
    from excel_tpu.ops.surgery import similarity_map_to_points
    rng = np.random.default_rng(1)
    sm = rng.random(64).astype(np.float32)     # 8x8 map
    ref_pts, ref_labels = clip_ref.similarity_map_to_points(
        torch.from_numpy(sm), (100, 120), t=0.8)
    pts, labels = similarity_map_to_points(sm, (100, 120), t=0.8)
    np.testing.assert_array_equal(labels, ref_labels)
    assert pts == [list(p) for p in ref_pts], (pts[:4], ref_pts[:4])


def test_descriptors_from_txt_matches_reference_semantics():
    """cli.make_attr_bank.descriptors_from_txt == the reference's
    transform_txt2json parsing (attributes_text/transform_txt2json.py:5-24)
    on the same raw dump."""
    import io

    from excel_tpu.cli.make_attr_bank import descriptors_from_txt

    names = ["aeroplane", "bicycle"]
    lines = []
    for c in names:
        lines += [f"{c}:\n", "[\n"]
        lines += [f'  "a {c} descriptor {i}",\n' for i in range(20)]
        lines += ["]\n", "\n"]
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.writelines(lines)
        path = f.name
    try:
        got = descriptors_from_txt(path, names)
        # reference parsing on the same content
        content = lines
        ref = {}
        index_up = 0
        for cls in names:
            index_low = index_up + 2
            index_up = index_low + 20
            values = content[index_low:index_up]
            index_up += 2
            ref[cls] = ["a clean origami %s. " % cls
                        + item.strip('  "').strip('",\n') for item in values]
        assert got == ref
    finally:
        os.unlink(path)
