"""TensorBoard logging factory.

Behavioral reference: liso/slim/utils/tb_factory.py:48-71 (cached named
SummaryWriters with a default global step). Uses torch's pure-python
SummaryWriter (torch is CPU-only here and only used for logging); degrades
to a no-op writer when tensorboard is unavailable.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict


class _NoopWriter:
    def __getattr__(self, name):
        return lambda *a, **k: None


class TBFactory:
    def __init__(self, base_dir):
        self.base_dir = Path(base_dir)
        self._writers: Dict[str, object] = {}
        self.global_step = 0

    def __call__(self, run: str, prefix: str = ""):
        key = run
        if key not in self._writers:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writers[key] = SummaryWriter(
                    log_dir=str(self.base_dir / run)
                )
            except Exception:
                self._writers[key] = _NoopWriter()
        return _PrefixedWriter(self._writers[key], prefix, self)


class _PrefixedWriter:
    def __init__(self, writer, prefix: str, factory: TBFactory):
        self._w = writer
        self._prefix = prefix
        self._factory = factory

    def add_scalar(self, tag, value, global_step=None):
        step = self._factory.global_step if global_step is None else global_step
        self._w.add_scalar(self._prefix + tag, float(value), step)

    def add_scalars(self, metrics: Dict[str, float], global_step=None):
        for k, v in metrics.items():
            self.add_scalar(k, v, global_step)

    def add_text(self, tag, text, global_step=None):
        step = self._factory.global_step if global_step is None else global_step
        self._w.add_text(self._prefix + tag, text, step)

    def add_image(self, tag, img, global_step=None, dataformats="HWC"):
        step = self._factory.global_step if global_step is None else global_step
        self._w.add_image(self._prefix + tag, img, step, dataformats=dataformats)

    def add_gif(self, tag, frames, global_step=None, fps: int = 5):
        """Animated-GIF image summary via a raw Summary.Image proto with
        GIF-encoded bytes (reference tracker/tracking.py:417-473 — TB
        renders animated GIFs in the images tab). frames: list of
        [H, W, 3] floats in [0, 1]. Degrades to the last frame as a
        static image if the proto path is unavailable."""
        step = self._factory.global_step if global_step is None else global_step
        if not frames:
            return
        try:
            import io

            import numpy as np
            from PIL import Image
            from tensorboard.compat.proto.summary_pb2 import Summary

            imgs = [
                Image.fromarray(
                    (np.clip(f, 0, 1) * 255).astype(np.uint8)
                )
                for f in frames
            ]
            buf = io.BytesIO()
            imgs[0].save(
                buf, format="GIF", save_all=True, append_images=imgs[1:],
                duration=int(1000 / fps), loop=0,
            )
            image = Summary.Image(
                height=imgs[0].height,
                width=imgs[0].width,
                colorspace=3,
                encoded_image_string=buf.getvalue(),
            )
            summary = Summary(
                value=[Summary.Value(tag=self._prefix + tag, image=image)]
            )
            self._w._get_file_writer().add_summary(summary, step)
        except Exception:
            self.add_image(tag, frames[-1], step)

    def flush(self):
        getattr(self._w, "flush", lambda: None)()
