"""Experiment logging: python logging + JSONL scalars (+TensorBoard if present).

Reference: utils/misc.py:75-130 (per-rank log files, TensorBoardX writer,
exp-name derived from non-default args).  TensorBoard is optional here; the
always-on sink is a ``scalars.jsonl`` stream any plotting tool can consume.
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import asdict, is_dataclass


def exp_name_from_config(cfg) -> str:
    """Compact human-readable run tag, logged for convenience.

    NB: the reference's ``make_exp_name`` (utils/misc.py:24-63, non-default
    args mangled into a string) is computed but DEAD -- ``prep_experiment``
    never uses its result and lays out directories as
    ``ckpt/date/args.exp/<MM_DD_HH>`` (utils/misc.py:100-103).  The rebuild
    follows the *live* layout (see ExperimentLogger) and keeps this readable
    tag only as an informational log line.
    """
    parts = [
        cfg.model.arch,
        "+".join(cfg.data.dataset),
        "mldg" if cfg.train.mldg else "agg",
    ]
    if cfg.model.memory.enabled:
        parts.append("mem")
    if cfg.model.whitening.use_wtloss:
        parts.append("wt" + "".join(map(str, cfg.model.whitening.wt_layer)))
    return "_".join(parts)


class ExperimentLogger:
    """Reference directory layout (utils/misc.py:100-103):
    ``ckpt/<date>/<exp>/<MM_DD_HH>`` for logs+checkpoints and
    ``tb_path/<date>/<exp>/<MM_DD_HH>`` for TensorBoard."""

    def __init__(self, cfg, exp_dir: str | None = None):
        # multi-host: per-rank log FILES, rank-0 console/TB/scalars
        # (reference utils/misc.py:75-90: per-rank file + rank-0 console)
        try:
            import jax

            self.proc = jax.process_index()
            self._multi = jax.process_count() > 1
        except Exception:
            self.proc, self._multi = 0, False
        stamp = time.strftime("%m_%d_%H")
        self.exp_dir = exp_dir or os.path.join(cfg.ckpt, cfg.date, cfg.exp, stamp)
        tb_path = getattr(cfg, "tb_path", None)
        if exp_dir is not None or not tb_path:
            # exp_dir already ends in date/exp/stamp -- re-appending them
            # would doubly nest the TB directory (ADVICE r4)
            self.tb_dir = os.path.join(self.exp_dir, "tb")
        else:
            self.tb_dir = os.path.join(tb_path, cfg.date, cfg.exp, stamp)
        os.makedirs(self.exp_dir, exist_ok=True)

        self.logger = logging.getLogger("pinmem")
        if not self.logger.handlers:
            self.logger.setLevel(logging.INFO)
            fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            log_name = (f"log_rank{self.proc}.txt" if self._multi
                        else "log.txt")
            fh = logging.FileHandler(os.path.join(self.exp_dir, log_name))
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)
            if self.proc == 0:
                sh = logging.StreamHandler()
                sh.setFormatter(fmt)
                self.logger.addHandler(sh)

        self._scalars = (open(os.path.join(self.exp_dir, "scalars.jsonl"), "a")
                         if self.proc == 0 else None)
        self._tb = None
        if self.proc == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter  # optional

                # --tb_tag: run comment appended to the TB dir
                # (utils/misc.py:128 passes it as SummaryWriter(comment=...))
                tag = getattr(cfg, "tb_tag", "") or ""
                self._tb = SummaryWriter(self.tb_dir + tag)
            except Exception:
                pass
        self.info(f"run tag: {exp_name_from_config(cfg)}")

        if self.proc == 0:
            cfg_dict = asdict(cfg) if is_dataclass(cfg) else dict(cfg)
            with open(os.path.join(self.exp_dir, "config.json"), "w") as f:
                json.dump(cfg_dict, f, indent=1, default=str)

    def info(self, msg: str):
        self.logger.info(msg)

    def scalars(self, step: int, values: dict, prefix: str = "loss"):
        if self._scalars is None:  # non-zero rank in a multi-host job
            return
        rec = {"step": step, **{f"{prefix}/{k}": _num(v) for k, v in values.items()}}
        self._scalars.write(json.dumps(rec) + "\n")
        self._scalars.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{prefix}/{k}", _num(v), step)


def _num(v):
    try:
        return float(v)
    except Exception:
        return v
