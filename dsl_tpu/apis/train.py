"""train_detector: config → datasets → loaders → jitted step → runner.

Parity with ``/root/reference/mmdet/apis/train.py:22-218`` (the semi branch):
builds the MultiDataLoader when ``cfg.data.unlabel_train`` exists, the EMA
teacher (in-state, replacing the second DDP model), the pseudo-label
refresher from ``cfg.data.unlabel_pred``, the eval hook from ``cfg.data.val``
— then runs the SemiRunner loop. All distribution is the device mesh; there
is no init_dist/launcher (SURVEY.md §2.3 translation).
"""

from __future__ import annotations

import os.path as osp
import random

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.data.formatting import DEFAULT_CANVAS
from dsl_tpu.data.loader import DetDataLoader, MultiDataLoader
from dsl_tpu.models.detectors.single_stage import build_detector
from dsl_tpu.parallel.mesh import make_mesh, replicate
from dsl_tpu.registry import DATASETS, build_from_cfg
from dsl_tpu.train import (
    build_optimizer_from_cfg, create_train_state, frozen_backbone_mask,
    jit_train_step, make_train_step)
from dsl_tpu.train.runner import SemiRunner
from dsl_tpu.train.semi import PseudoLabelRefresher
from dsl_tpu.train.label_store import LabelStore
from dsl_tpu.utils.logger import get_root_logger


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def build_dataset(cfg: dict):
    return build_from_cfg(dict(cfg), DATASETS)


def _canvas_from_cfg(cfg) -> tuple[int, int]:
    c = cfg.get("canvas_hw") if hasattr(cfg, "get") else None
    return tuple(c) if c else DEFAULT_CANVAS


def train_detector(cfg, work_dir: str, resume_from: str | None = None,
                   seed: int = 0, max_devices: int | None = None):
    logger = get_root_logger(log_file=osp.join(work_dir, "train.log"))
    set_random_seed(seed)

    devices = jax.devices()
    if max_devices:
        devices = devices[:max_devices]
    n_dev = len(devices)
    mesh = make_mesh(n_data=n_dev, n_model=1, devices=devices)
    logger.info("mesh: %d data-parallel devices", n_dev)

    detector = build_detector(cfg.model.to_dict()
                              if hasattr(cfg.model, "to_dict")
                              else dict(cfg.model))

    canvas = _canvas_from_cfg(cfg)
    data_cfg = cfg.data
    samples_per_gpu = data_cfg.get("samples_per_gpu", 2)
    workers = data_cfg.get("workers_per_gpu", 2)

    train_ds = build_dataset(data_cfg["train"])
    _check_num_classes(cfg, train_ds, logger)
    semi = "unlabel_train" in data_cfg
    scale_invariant = bool(cfg.get("scale_invariant", False))

    label_loader = DetDataLoader(train_ds, samples_per_gpu, workers,
                                 canvas_hw=canvas, seed=seed)
    if semi:
        unlabel_ds = build_dataset(data_cfg["unlabel_train"])
        ratio = data_cfg.get("batch_config", {}).get("ratio", [[1, 1]])[0]
        unlabel_weight = cfg.model.get("bbox_head", {}).get("loss_weight", 1.0)
        unlabel_loader = DetDataLoader(unlabel_ds, samples_per_gpu, workers,
                                       canvas_hw=canvas, seed=seed + 1)
        data_loader = MultiDataLoader(
            label_loader, unlabel_loader, ratio=ratio,
            unlabel_weight=unlabel_weight, scale_invariant=scale_invariant,
            n_shards=n_dev)
        steps_per_epoch = len(data_loader)
    else:
        data_loader = label_loader
        steps_per_epoch = len(label_loader)

    # init model variables at the training canvas shape
    from dsl_tpu.models.detectors.single_stage import init_detector_variables

    init_imgs = jnp.zeros((1, *canvas, 3), jnp.float32)
    variables = init_detector_variables(detector, jax.random.PRNGKey(seed),
                                        init_imgs)
    variables = _maybe_load_pretrained(cfg, detector, variables, logger)

    frozen = frozen_backbone_mask(
        variables["params"],
        cfg.model.get("backbone", {}).get("frozen_stages", -1))
    tx, sched = build_optimizer_from_cfg(
        variables["params"], dict(cfg.optimizer),
        optimizer_config=dict(cfg.get("optimizer_config", {}) or {}),
        lr_config=dict(cfg.get("lr_config", {}) or {}),
        steps_per_epoch=steps_per_epoch, frozen_mask=frozen,
        total_epochs=dict(cfg.get("runner", {}) or {}).get("max_epochs", 12),
        momentum_config=dict(cfg.get("momentum_config", {}) or {}) or None)
    state = create_train_state(variables, tx,
                               ema_ratio=dict(cfg.get('ema_config', {})
                                              or {}).get('ratio', 0.99))

    ema_cfg = dict(cfg.get("ema_config", {}) or {})
    # cfg.fp16 (reference Fp16OptimizerHook, ``apis/train.py:153-156``) maps
    # to bf16 mixed precision on TPU: bf16 keeps f32's exponent range so the
    # reference's loss_scale machinery is unnecessary and ignored.
    fp16_cfg = cfg.get("fp16", None)
    train_step = make_train_step(
        detector, tx,
        frozen_mask=frozen,
        compute_dtype=jnp.bfloat16 if fp16_cfg else None,
        ema_interval=ema_cfg.get("interval", 1)
        if ema_cfg.get("mode", "iteration") == "iteration" else -1,
        ema_start_iter=ema_cfg.get("start_point", 1))
    jstep = jit_train_step(train_step, mesh)

    # Dynamic R-CNN: host-side hyperparameter schedule fed back as traced
    # scalars (see models/roi_heads/dynamic_pisa.py)
    dyn_schedule = None
    if type(detector).__name__ == "DynamicRCNN":
        from dsl_tpu.models.roi_heads.dynamic_pisa import DynamicRCNNSchedule

        dyn = dict((dict(cfg.model.get("train_cfg", {}) or {}))
                   .get("dynamic_rcnn", {}) or {})
        dyn_schedule = DynamicRCNNSchedule(
            initial_iou=dyn.get("initial_iou", 0.4),
            initial_beta=dyn.get("initial_beta", 1.0),
            update_iter_interval=dyn.get("update_iter_interval", 100))

    # Seesaw: host-side running class counts (core/losses.py SeesawCounter)
    seesaw_counter = None
    bh = getattr(detector, "bbox_head", None)
    if dict(getattr(bh, "loss_cls", None) or {}).get("type") == "SeesawLoss":
        from dsl_tpu.core.losses import SeesawCounter

        seesaw_counter = SeesawCounter(bh.num_classes)

    # generic loss-state feedback: metrics keys ``state_<name>`` become the
    # next batch's ``<name>`` (e.g. GHM EMA bin counts). Pre-seed known
    # states so the batch pytree structure is stable from step 1 (a late
    # key would retrace the whole step — 1-10 min remote compile)
    loss_state: dict = {}
    bh0 = getattr(detector, "bbox_head", None)
    cls0 = dict(getattr(bh0, "loss_cls", None) or {})
    if cls0.get("type") == "GHMC" and float(cls0.get("momentum", 0)) > 0:
        loss_state["ghm_acc_sum"] = np.zeros(
            (int(cls0.get("bins", 10)),), np.float32)
    bb0 = dict(getattr(bh0, "loss_bbox", None) or {})
    if bb0.get("type") == "GHMR" and float(bb0.get("momentum", 0)) > 0:
        loss_state["ghm_r_acc_sum"] = np.zeros(
            (int(bb0.get("bins", 10)),), np.float32)

    def step_with_placement(state, batch):
        from dsl_tpu.parallel.mesh import shard_batch

        batch = {k: v for k, v in batch.items() if k != "meta"}
        if seesaw_counter is not None:
            seesaw_counter.update(batch["gt_labels"],
                                  batch.get("gt_valid"))
            batch["cum_samples"] = np.asarray(seesaw_counter.counts)
        if dyn_schedule is not None:
            batch["dyn_iou_thr"] = np.float32(dyn_schedule.iou_thr)
            batch["dyn_beta"] = np.float32(dyn_schedule.beta)
        batch.update(loss_state)
        # si_pair's per-shard index arrays shard on 'data' like the rest
        placed = shard_batch(mesh, batch)
        state, metrics = jstep(state, placed)
        if dyn_schedule is not None and "dynamic_iou" in metrics:
            dyn_schedule.update(float(metrics["dynamic_iou"]),
                                float(metrics["dynamic_beta"]))
        for k, v in metrics.items():
            if k.startswith("state_"):
                loss_state[k[len("state_"):]] = np.asarray(v)
        return state, metrics

    state = replicate(mesh, state)

    # pseudo-label refresher (UnlabelPredHook parity)
    refresher = None
    adathres_file = None
    if semi and "unlabel_pred" in data_cfg:
        up = data_cfg["unlabel_pred"]
        with open(up["category_info_path"], "r", encoding="utf-8") as f:
            import json as _json

            cat_info = _json.load(f)
        store = LabelStore(up["anno_root_path"], cat_info["id2cat"],
                           cat_info["cat2id"])
        ec = up.get("eval_checkpoint_config", {})
        from dsl_tpu.data.pipelines.compose import test_pipeline_params

        up_tp = test_pipeline_params(dict(up).get("pipeline"))
        refresher = PseudoLabelRefresher(
            detector, store,
            image_root=up.get("image_root_path", up.get("img_path", "")),
            image_infos=unlabel_ds.data_infos,
            test_cfg=dict(cfg.model.get("test_cfg", {}) or {}),
            canvas_hw=canvas,
            img_scale=up_tp["img_scale"],
            img_norm=up_tp["img_norm"] or dict(
                mean=(123.675, 116.28, 103.53),
                std=(58.395, 57.12, 57.375), to_rgb=True),
            infer_score_thre=up.get("infer_score_thre", 0.1),
            iou=up.get("eval_config", {}).get("iou", [0.6])[0],
            fuse_history=up.get("fuse_history", False),
            first_fuse=up.get("first_fuse", False),
            first_score_thre=up.get("first_score_thre", 0.1),
            use_ema=up.get("use_ema", True),
            eval_flip=up.get("eval_flip", False),
            mode=ec.get("mode", "iteration"),
            interval=ec.get("interval", 1),
            start_point=up.get("start_point", 8),
            preload=up.get("preload", 6))
        thres = data_cfg["unlabel_train"].get("thres")
        if isinstance(thres, str):
            adathres_file = thres

    # eval on the EMA weights (reference evaluates teacher when ema_flag)
    eval_fn = None
    if "val" in data_cfg and cfg.get("evaluation"):
        from dsl_tpu.apis.test import single_device_test

        val_ds = build_dataset({**dict(data_cfg["val"]), "test_mode": True})
        from dsl_tpu.data.pipelines.compose import test_pipeline_params

        tp = test_pipeline_params(dict(data_cfg["val"]).get("pipeline"))

        def eval_fn(state):
            return single_device_test(
                detector, state.teacher_variables if semi
                else state.student_variables,
                val_ds, test_cfg=dict(cfg.model.get("test_cfg", {}) or {}),
                canvas_hw=canvas, img_scale=tp["img_scale"],
                img_norm=tp["img_norm"])

    runner_cfg = dict(cfg.get("runner", {}) or {})
    runner = SemiRunner(
        step_with_placement, state, data_loader, work_dir,
        max_epochs=runner_cfg.get("max_epochs", 12),
        log_interval=dict(cfg.get("log_config", {}) or {}).get("interval", 10),
        refresher=refresher, adathres_file=adathres_file,
        eval_fn=eval_fn,
        eval_interval=dict(cfg.get("evaluation", {}) or {}).get("interval", 1),
        checkpoint_interval=dict(
            cfg.get("checkpoint_config", {}) or {}).get("interval", 1),
        ema_step_decay=list(ema_cfg.get("step_decay") or []),
        ema_decay_ratio=ema_cfg.get("decay_ratio", 0.1),
        logger=logger)
    if resume_from:
        runner.resume(resume_from)
    runner.run()
    return runner


def _check_num_classes(cfg, dataset, logger):
    """NumClassCheckHook parity (``mmdet/datasets/utils.py:115+``): the
    head's num_classes must match the dataset's CLASSES length."""
    head_nc = cfg.model.get("bbox_head", {}).get("num_classes")
    classes = getattr(dataset, "CLASSES", None)
    if head_nc is not None and classes:
        if len(classes) != head_nc:
            logger.warning(
                "num_classes mismatch: head has %d but dataset %s has %d "
                "classes", head_nc, type(dataset).__name__, len(classes))


def _maybe_load_pretrained(cfg, detector, variables, logger):
    """Load torch-format backbone weights when configured."""
    pretrained = cfg.model.get("backbone", {}).get("pretrained")
    load_from = cfg.get("load_from")
    if pretrained and osp.exists(str(pretrained)):
        from dsl_tpu.utils.torch_import import load_torch_backbone

        try:
            variables = load_torch_backbone(str(pretrained), variables,
                                            cfg.model["backbone"]["type"])
            logger.info("Loaded pretrained backbone from %s", pretrained)
        except Exception as e:  # noqa: BLE001
            logger.warning("Pretrained load failed (%s); training from "
                           "scratch init", e)
    if load_from and osp.exists(str(load_from)):
        from dsl_tpu.utils.torch_import import load_torch_detector

        try:
            variables = load_torch_detector(str(load_from), variables)
            logger.info("Loaded detector weights from %s", load_from)
        except Exception as e:  # noqa: BLE001
            logger.warning("load_from failed: %s", e)
    return variables
