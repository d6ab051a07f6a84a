"""Torch oracles for standalone loss modules: GHM-C / GHM-R (incl. the
momentum EMA bins), VarifocalLoss, BalancedL1Loss, SeesawLoss (incl. the
cumulative per-class counts) against the reference's OWN code
(``/root/reference/mmdet/models/losses/*.py`` run on CPU with mmcv stubbed).

These losses are exercised by heads (GHM retina variants, VFNet, Libra,
Seesaw mask-rcnn LVIS) whose head-level oracles use other loss configs, so
the loss modules themselves get pinned here on adversarial inputs (empty
bins, zero weights, repeated stateful calls).

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_GHM = osp.join(REF_ROOT, "models/losses/ghm_loss.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_GHM),
                                reason="reference tree not available")


def _load_reference_losses():
    import importlib.util

    new_mods = {}

    def _stub(name):
        mod = types.ModuleType(name)
        new_mods[name] = mod
        return mod

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        new_mods[name] = mod
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mmcv = _stub("mmcv")
    mmcv.jit = lambda **kw: (lambda f: f)

    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    for pkg in ("refml", "refml.models", "refml.models.losses"):
        _stub(pkg)
    builder = _stub("refml.models.builder")
    builder.LOSSES = _Reg()

    saved = {k: sys.modules.get(k) for k in set(new_mods)}
    sys.modules.update(new_mods)
    try:
        _load("refml.models.losses.utils",
              osp.join(REF_ROOT, "models/losses/utils.py"))
        _load("refml.models.losses.accuracy",
              osp.join(REF_ROOT, "models/losses/accuracy.py"))
        _load("refml.models.losses.cross_entropy_loss",
              osp.join(REF_ROOT, "models/losses/cross_entropy_loss.py"))
        ghm = _load("refml.models.losses.ghm_loss", REF_GHM)
        vfl = _load("refml.models.losses.varifocal_loss",
                    osp.join(REF_ROOT, "models/losses/varifocal_loss.py"))
        bl1 = _load("refml.models.losses.balanced_l1_loss",
                    osp.join(REF_ROOT,
                             "models/losses/balanced_l1_loss.py"))
        seesaw = _load("refml.models.losses.seesaw_loss",
                       osp.join(REF_ROOT, "models/losses/seesaw_loss.py"))
        return types.SimpleNamespace(GHMC=ghm.GHMC, GHMR=ghm.GHMR,
                                     VarifocalLoss=vfl.VarifocalLoss,
                                     BalancedL1Loss=bl1.BalancedL1Loss,
                                     SeesawLoss=seesaw.SeesawLoss)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_losses()


def test_ghmc_matches_reference(ref_mod):
    """GHMC (``ghm_loss.py:22-118``): BCE reweighted by inverse gradient
    density over 10 bins (normalized by the non-empty bin count), avg by the
    valid count — incl. the momentum>0 EMA-bin state across two calls."""
    import jax.numpy as jnp
    from dsl_tpu.core import losses as L

    rng = np.random.RandomState(3)
    n, c = 64, 6
    for momentum in (0.0, 0.75):
        head = ref_mod.GHMC(bins=10, momentum=momentum, use_sigmoid=True,
                            loss_weight=1.0)
        acc = jnp.zeros((10,), jnp.float32)
        for step in range(2 if momentum > 0 else 1):
            pred = rng.randn(n, c).astype(np.float32) * 2
            target = (rng.rand(n, c) > 0.8).astype(np.float32)
            lw = (rng.rand(n, c) > 0.2).astype(np.float32)
            with torch.no_grad():
                ref = float(head(torch.from_numpy(pred),
                                 torch.from_numpy(target),
                                 torch.from_numpy(lw)))
            if momentum > 0:
                ours, acc = L.ghm_c_loss(jnp.asarray(pred),
                                         jnp.asarray(target),
                                         jnp.asarray(lw), bins=10,
                                         momentum=momentum, acc_sum=acc)
            else:
                ours = L.ghm_c_loss(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(lw), bins=10)
            np.testing.assert_allclose(
                float(ours), ref, rtol=5e-5, atol=1e-6,
                err_msg=f"momentum={momentum} step={step}")


def test_ghmr_matches_reference(ref_mod):
    """GHMR (``ghm_loss.py:121-213``): ASL1 ``sqrt(d²+mu²)-mu`` with
    gradient-density reweighting, avg by the valid count; momentum state."""
    import jax.numpy as jnp
    from dsl_tpu.core import losses as L

    rng = np.random.RandomState(5)
    n = 48
    for momentum in (0.0, 0.7):
        head = ref_mod.GHMR(mu=0.02, bins=10, momentum=momentum,
                            loss_weight=1.0)
        acc = jnp.zeros((10,), jnp.float32)
        for step in range(2 if momentum > 0 else 1):
            pred = rng.randn(n, 4).astype(np.float32)
            target = rng.randn(n, 4).astype(np.float32) * 0.5
            lw = (rng.rand(n, 4) > 0.3).astype(np.float32)
            with torch.no_grad():
                ref = float(head(torch.from_numpy(pred),
                                 torch.from_numpy(target),
                                 torch.from_numpy(lw)))
            if momentum > 0:
                ours, acc = L.ghm_r_loss(jnp.asarray(pred),
                                         jnp.asarray(target),
                                         jnp.asarray(lw), mu=0.02, bins=10,
                                         momentum=momentum, acc_sum=acc)
            else:
                ours = L.ghm_r_loss(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(lw), mu=0.02, bins=10)
            np.testing.assert_allclose(
                float(ours), ref, rtol=5e-5, atol=1e-6,
                err_msg=f"momentum={momentum} step={step}")


def test_varifocal_matches_reference(ref_mod):
    """VarifocalLoss (``varifocal_loss.py``): IoU-weighted BCE with focal
    negative down-weighting, both iou_weighted settings, per-anchor weight
    broadcast and avg_factor."""
    import jax.numpy as jnp
    from dsl_tpu.core import losses as L

    rng = np.random.RandomState(7)
    n, c = 40, 6
    pred = rng.randn(n, c).astype(np.float32)
    target = np.zeros((n, c), np.float32)
    pos = rng.rand(n) < 0.3
    target[pos, rng.randint(0, c, size=int(pos.sum()))] = \
        rng.rand(int(pos.sum())).astype(np.float32)
    # VFNet calls the loss with weight=None (per-element weighting is
    # baked into the iou targets); reference weight must match loss shape
    w = (rng.rand(n, c) > 0.1).astype(np.float32)
    for iou_weighted in (True, False):
        head = ref_mod.VarifocalLoss(use_sigmoid=True, alpha=0.75,
                                     gamma=2.0, iou_weighted=iou_weighted,
                                     loss_weight=1.0)
        with torch.no_grad():
            ref = float(head(torch.from_numpy(pred),
                             torch.from_numpy(target),
                             weight=torch.from_numpy(w), avg_factor=17.0))
        ours = float(L.varifocal_loss(
            jnp.asarray(pred), jnp.asarray(target), alpha=0.75, gamma=2.0,
            iou_weighted=iou_weighted, weight=jnp.asarray(w),
            avg_factor=17.0))
        np.testing.assert_allclose(ours, ref, rtol=5e-5, atol=1e-6,
                                   err_msg=f"iou_weighted={iou_weighted}")


def test_balanced_l1_matches_reference(ref_mod):
    """BalancedL1Loss (``balanced_l1_loss.py``, Libra R-CNN defaults
    alpha .5 / gamma 1.5 / beta 1)."""
    import jax.numpy as jnp
    from dsl_tpu.core import losses as L

    rng = np.random.RandomState(11)
    n = 32
    pred = rng.randn(n, 4).astype(np.float32) * 2
    target = rng.randn(n, 4).astype(np.float32)
    w = (rng.rand(n, 4) > 0.2).astype(np.float32)
    head = ref_mod.BalancedL1Loss(alpha=0.5, gamma=1.5, beta=1.0,
                                  loss_weight=1.0)
    with torch.no_grad():
        ref = float(head(torch.from_numpy(pred), torch.from_numpy(target),
                         weight=torch.from_numpy(w), avg_factor=21.0))
    ours = float(L.balanced_l1_loss(
        jnp.asarray(pred), jnp.asarray(target), beta=1.0, alpha=0.5,
        gamma=1.5, weight=jnp.asarray(w), avg_factor=21.0))
    np.testing.assert_allclose(ours, ref, rtol=5e-5, atol=1e-6)


def test_htc_semantic_loss_matches_reference():
    """HTC FusedSemanticHead.loss (``fused_semantic_head.py:82,102-106``)
    IS ``nn.CrossEntropyLoss(ignore_index=255) * 0.2`` — executed here as
    the oracle, incl. ignore pixels."""
    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.htc import semantic_seg_loss

    rng = np.random.RandomState(17)
    nc, hgt, wid = 183, 16, 20
    logits = rng.randn(2, hgt, wid, nc).astype(np.float32)
    labels = rng.randint(0, nc, size=(2, hgt, wid)).astype(np.int64)
    labels[:, :3] = 255                       # ignore band
    crit = torch.nn.CrossEntropyLoss(ignore_index=255)
    with torch.no_grad():
        ref = float(crit(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels)) * 0.2)
    ours = float(semantic_seg_loss(jnp.asarray(logits),
                                   jnp.asarray(labels.astype(np.int32)),
                                   loss_weight=0.2))
    np.testing.assert_allclose(ours, ref, rtol=5e-5, atol=1e-6)


def test_seesaw_matches_reference(ref_mod):
    """SeesawLoss (``seesaw_loss.py:79-263``): split (C + 2) head —
    objectness CE over all samples + seesaw CE over positives with
    mitigation (cum-sample ratio^p) and compensation (score ratio^q) —
    including the cumulative per-class counts across two calls."""
    import jax.numpy as jnp
    from dsl_tpu.core.losses import seesaw_loss

    rng = np.random.RandomState(13)
    nc = 6
    n = 50
    head = ref_mod.SeesawLoss(p=0.8, q=2.0, num_classes=nc, eps=1e-2,
                              return_dict=True)
    cum = jnp.zeros((nc + 1,), jnp.float32)
    for step in range(2):
        score = rng.randn(n, nc + 2).astype(np.float32)
        labels = rng.randint(0, nc + 1, size=n).astype(np.int64)
        with torch.no_grad():
            ref = head(torch.from_numpy(score), torch.from_numpy(labels))
        ref_classes = float(ref["loss_cls_classes"])
        ref_obj = float(ref["loss_cls_objectness"])
        lc, lo, cum = seesaw_loss(jnp.asarray(score),
                                  jnp.asarray(labels.astype(np.int32)),
                                  cum, nc, p=0.8, q=2.0, eps=1e-2)
        np.testing.assert_allclose(float(lc), ref_classes, rtol=5e-5,
                                   atol=1e-6, err_msg=f"classes step{step}")
        np.testing.assert_allclose(float(lo), ref_obj, rtol=5e-5,
                                   atol=1e-6, err_msg=f"objness step{step}")
        np.testing.assert_allclose(
            np.asarray(cum), head.cum_samples.numpy(), err_msg="cum_samples")
