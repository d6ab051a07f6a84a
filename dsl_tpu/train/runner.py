"""SemiRunner: the epoch-driven training orchestrator.

The functional redesign of ``SemiEpochBasedRunner``
(``/root/reference/mmdet/runner/hooks/semi_epoch_based_runner.py:49-511``) +
its hook stack: instead of a mutable runner with priority-ordered hooks, the
loop is explicit — per iteration the jitted train step (which already
contains the EMA update and gradient sync), then the pseudo-label refresher;
per epoch checkpointing (student + teacher, mirroring ``epoch_N.pth`` /
``epoch_N.pth_ema`` :411-458), evaluation on the EMA weights when enabled
(:273-289), adathres recompute, and LR-decay-coupled EMA ratio step
(``ema.py:22-26``).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Callable

import numpy as np

from dsl_tpu.train.train_state import TrainState
from dsl_tpu.utils.logger import get_root_logger


class LogBuffer:
    """Running-average metric buffer (mmcv LogBuffer equivalent)."""

    def __init__(self):
        self.history: dict[str, list[float]] = {}

    def update(self, vals: dict):
        for k, v in vals.items():
            arr = np.asarray(v)
            if arr.size != 1:      # vector aux state (e.g. GHM bin counts)
                continue
            self.history.setdefault(k, []).append(float(arr.reshape(())))

    def average(self, window: int = 50) -> dict:
        return {k: float(np.mean(v[-window:]))
                for k, v in self.history.items()}

    def clear(self):
        self.history.clear()


class SemiRunner:
    def __init__(self, train_step: Callable, state: TrainState,
                 data_loader, work_dir: str, max_epochs: int = 28,
                 log_interval: int = 10, refresher=None,
                 adathres_file: str | None = None,
                 adathres_settings: dict | None = None,
                 eval_fn: Callable | None = None, eval_interval: int = 1,
                 checkpoint_interval: int = 1,
                 ema_step_decay: list[int] | None = None,
                 ema_decay_ratio: float = 0.1, logger=None):
        self.train_step = train_step
        self.state = state
        self.data_loader = data_loader
        self.work_dir = work_dir
        self.max_epochs = max_epochs
        self.log_interval = log_interval
        self.refresher = refresher
        self.adathres_file = adathres_file
        self.adathres_settings = adathres_settings
        self.eval_fn = eval_fn
        self.eval_interval = eval_interval
        self.checkpoint_interval = checkpoint_interval
        self.ema_step_decay = ema_step_decay or []
        self.ema_decay_ratio = ema_decay_ratio
        self.epoch = 0
        self.log_buffer = LogBuffer()
        self.logger = logger or get_root_logger(
            log_file=osp.join(work_dir, "train.log"))
        os.makedirs(work_dir, exist_ok=True)
        # JSON-line metrics log (reference writes timestamped .log.json;
        # tools/analyze_logs.py reads either format)
        self.json_log_path = osp.join(work_dir, "train.log.json")

    # -- main loop ---------------------------------------------------------
    def run(self):
        self.logger.info("Start training: %d epochs, %d iters/epoch",
                         self.max_epochs, len(self.data_loader))
        while self.epoch < self.max_epochs:
            self.train_epoch()
            if (self.epoch + 1) % self.checkpoint_interval == 0:
                self.save_checkpoint()
            if self.refresher is not None:
                self.refresher.after_train_epoch(
                    self.state, self.epoch, self.adathres_file,
                    self.adathres_settings)
            if self.eval_fn and (self.epoch + 1) % self.eval_interval == 0:
                metrics = self.eval_fn(self.state)
                self.logger.info("eval epoch %d: %s", self.epoch + 1, metrics)
            self.epoch += 1
        self.logger.info("Training done.")

    def train_epoch(self):
        self.data_loader.set_epoch(self.epoch)
        upcoming = None
        consumed_per_iter = 0
        if self.refresher is not None and hasattr(
                self.data_loader, "unlabel_loader"):
            unl = self.data_loader.unlabel_loader
            idx_order = unl.upcoming_indices()
            # Extend with the next epoch's deterministic order: the endless
            # unlabeled stream wraps into epoch+1 mid-epoch, and the final
            # ``preload`` iterations' look-ahead lands past this epoch's end.
            # (The reference's runner.ITER silently refreshes nothing there —
            # unlabel_pred_hook.py:512-562; determinism lets us do better.)
            idx_order = idx_order + list(unl.sampler.set_epoch(self.epoch + 1))
            unl.sampler.set_epoch(self.epoch)
            infos = unl.dataset.data_infos
            upcoming = [infos[i]["filename"] for i in idx_order]
            n_lab = self.data_loader.label_loader.samples_per_gpu
            consumed_per_iter = max(1, int(round(
                n_lab * self.data_loader.ratio[1]
                / self.data_loader.ratio[0])))

        t_data = time.perf_counter()
        pending_refresh = None
        for it, batch in enumerate(self.data_loader):
            data_time = time.perf_counter() - t_data
            meta = batch.pop("meta", None)
            self.state, metrics = self.train_step(self.state, batch)
            if self.refresher is not None and upcoming is not None:
                # Overlap the pseudo-label refresh with device compute:
                # complete LAST iter's teacher predict (device long done),
                # then dispatch this iter's — the blocking result fetch
                # never sits between two device programs. The refresher's
                # ``preload`` margin covers the one-iter write delay.
                if pending_refresh is not None:
                    pending_refresh()
                dispatch = getattr(self.refresher,
                                   "dispatch_after_train_iter", None)
                if dispatch is not None:
                    pending_refresh = dispatch(self.state, self.epoch,
                                               upcoming, it,
                                               consumed_per_iter)
                else:       # simple recorder/mock refreshers
                    self.refresher.after_train_iter(
                        self.state, self.epoch, upcoming, it,
                        consumed_per_iter)
            iter_time = time.perf_counter() - t_data
            self.log_buffer.update(
                {**{k: v for k, v in metrics.items()},
                 "time": iter_time, "data_time": data_time})
            if (it + 1) % self.log_interval == 0:
                avg = self.log_buffer.average(self.log_interval)
                msg = " ".join(f"{k}: {v:.4f}" for k, v in avg.items())
                self.logger.info("Epoch [%d][%d/%d] %s", self.epoch + 1,
                                 it + 1, len(self.data_loader), msg)
                with open(self.json_log_path, "a", encoding="utf-8") as f:
                    f.write(json.dumps(dict(mode="train",
                                            epoch=self.epoch + 1,
                                            iter=it + 1, **{
                                                k: round(v, 5)
                                                for k, v in avg.items()}))
                            + "\n")
            t_data = time.perf_counter()

        if pending_refresh is not None:     # flush the overlapped refresh
            pending_refresh()

        # EMA ratio step decay at configured epochs (EMAOWNHook.step_decay:
        # ratio -> max(1 - (1-ratio)/decay_ratio, 0.01), ``ema.py:22-26``)
        if (self.epoch + 1) in self.ema_step_decay:
            import jax.numpy as jnp

            r = float(np.asarray(self.state.ema_ratio))
            new_r = max(1.0 - (1.0 - r) / self.ema_decay_ratio, 0.01)
            self.state = self.state.replace(
                ema_ratio=jnp.asarray(new_r, jnp.float32))
            self.logger.info("EMA ratio step-decay at epoch %d: %f -> %f",
                             self.epoch + 1, r, new_r)

    # -- checkpoint --------------------------------------------------------
    def save_checkpoint(self, name: str | None = None):
        from dsl_tpu.utils.checkpoint import save_checkpoint

        name = name or f"epoch_{self.epoch + 1}"
        path = osp.join(self.work_dir, name)
        save_checkpoint(path, self.state, meta=dict(epoch=self.epoch + 1))
        latest = osp.join(self.work_dir, "latest")
        try:
            if osp.islink(latest) or osp.exists(latest):
                os.remove(latest)
            os.symlink(name, latest)
        except OSError:
            pass
        self.logger.info("Saved checkpoint %s", path)

    def resume(self, path: str):
        from dsl_tpu.utils.checkpoint import load_checkpoint

        self.state, meta = load_checkpoint(path, self.state)
        self.epoch = int(meta.get("epoch", 0))
        self.logger.info("Resumed from %s at epoch %d", path, self.epoch)
