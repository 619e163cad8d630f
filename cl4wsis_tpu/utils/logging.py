"""Experiment logging: rank-0, buffered epoch/intermediate streams, CSV.

Re-design of reference ``utils/logger.py`` (WandBLogger): same surface —
add_scalar/add_figure/add_table with an `intermediate` stream, commit()
batching, CSV result files — backed by JSONL + CSV on disk, with optional
wandb if the package is ever present (it is not in this image).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional


class Logger:
    def __init__(self, logdir: str, rank: int = 0, step: Optional[int] = None,
                 name: Optional[str] = None, summary: bool = True):
        self.rank = rank
        self.is_main = rank == 0
        self.logdir = logdir
        self.step = step
        self.name = name or "experiment"
        self._epoch_buf: Dict[str, Any] = {}
        self._inter_buf: Dict[str, Any] = {}
        self._wandb = None
        if self.is_main and summary:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = open(os.path.join(logdir, f"{self.name}.jsonl"), "a")
            try:  # pragma: no cover - wandb not installed here
                import wandb
                self._wandb = wandb.init(project="cl4wsis_tpu", name=self.name,
                                         dir=logdir, resume="allow")
            except Exception:
                self._wandb = None
        else:
            self._jsonl = None

    # ----- reference-compatible surface (utils/logger.py:38-128) -------

    def add_scalar(self, tag: str, value: Any, step: Optional[int] = None,
                   intermediate: bool = False):
        buf = self._inter_buf if intermediate else self._epoch_buf
        buf[tag] = float(value)
        if step is not None:
            buf["step"] = step

    def add_config(self, cfg: Any):
        if not self.is_main:
            return
        blob = {k: v for k, v in vars(cfg).items()} if not isinstance(cfg, dict) else cfg
        self._write({"type": "config", **_jsonable(blob)})

    def add_results(self, results: Dict):
        if self.is_main:
            self._write({"type": "results", **_jsonable(results)})

    def add_image(self, tag: str, image, step: Optional[int] = None):
        """Save a (H, W, 3) uint8/float image under the log dir
        (the reference pushes sample images to wandb; here they land on
        disk and in wandb when available)."""
        if not self.is_main:
            return
        import numpy as np
        from PIL import Image as PILImage
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        d = os.path.join(self.logdir, "images")
        os.makedirs(d, exist_ok=True)
        name = f"{tag.replace('/', '_')}_{step if step is not None else 0}.png"
        PILImage.fromarray(arr).save(os.path.join(d, name))
        if self._wandb is not None:  # pragma: no cover
            import wandb
            self._wandb.log({tag: wandb.Image(arr)})

    def add_table(self, tag: str, rows, columns=None):
        """Log a small table (list of rows) as a JSONL record."""
        if self.is_main:
            self._write({"type": "table", "tag": tag,
                         "columns": columns, "rows": _jsonable_list(rows)})

    def add_figure(self, tag: str, figure, step: Optional[int] = None):
        """Save a matplotlib figure under the log dir."""
        if not self.is_main:
            return
        d = os.path.join(self.logdir, "figures")
        os.makedirs(d, exist_ok=True)
        name = f"{tag.replace('/', '_')}_{step if step is not None else 0}.png"
        figure.savefig(os.path.join(d, name), bbox_inches="tight")

    def commit(self, intermediate: bool = False):
        buf = self._inter_buf if intermediate else self._epoch_buf
        if buf and self.is_main:
            self._write({"type": "inter" if intermediate else "epoch",
                         "t": time.time(), **buf})
            if self._wandb is not None:  # pragma: no cover
                self._wandb.log(buf)
        buf.clear()

    def log_csv_results(self, path: str, row: Dict):
        """CSV result files (utils/logger.py:102-128)."""
        if not self.is_main:
            return
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        exists = os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            if not exists:
                w.writeheader()
            w.writerow(_jsonable(row))

    def info(self, msg: str):
        if self.is_main:
            print(msg, flush=True)

    def debug(self, msg: str):
        if self.is_main:
            print(msg, flush=True)

    def error(self, msg: str):
        print(f"[rank {self.rank}] {msg}", flush=True)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()

    def _write(self, obj: Dict):
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(obj) + "\n")
            self._jsonl.flush()


def _jsonable_list(rows):
    out = []
    for r in rows:
        try:
            json.dumps(r)
            out.append(r)
        except TypeError:
            out.append(str(r))
    return out


def _jsonable(d: Dict) -> Dict:
    out = {}
    for k, v in d.items():
        try:
            json.dumps(v)
            out[k] = v
        except TypeError:
            out[k] = str(v)
    return out


class StepTimer:
    """jax.profiler trace hook + blocking step timing (SURVEY.md §5:
    the reference has no tracing; this is the promised upgrade)."""

    def __init__(self, trace_dir: Optional[str] = None,
                 trace_steps: range = range(10, 13)):
        self.trace_dir = trace_dir
        self.trace_steps = trace_steps
        self._tracing = False
        self.times = []
        self._t0 = None

    def start_step(self, step: int):
        import jax
        if self.trace_dir and step == self.trace_steps.start:
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        self._t0 = time.perf_counter()

    def end_step(self, step: int, blocker: Any = None):
        import jax
        if blocker is not None:
            jax.block_until_ready(blocker)
        self.times.append(time.perf_counter() - self._t0)
        if self._tracing and step >= self.trace_steps.stop - 1:
            jax.profiler.stop_trace()
            self._tracing = False

    def summary(self) -> Dict[str, float]:
        import numpy as np
        if not self.times:
            return {}
        t = np.asarray(self.times[1:] or self.times)
        return {"mean_s": float(t.mean()), "p50_s": float(np.median(t)),
                "max_s": float(t.max())}
