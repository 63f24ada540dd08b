"""Sweep visualization: NWB sweep series -> PNG thumbnails (ref
src/trace/visualization/lnmc_nwb_visualization.py:12-171 renders each
sweep's i/v series to PNG via matplotlib; src/trace/thumbnail.py:25-62
posts them as resource thumbnails).

Spark-first shape: one ``applyInPandas`` call per (file, sweep,
channel) group; inside, a pure-numpy polyline rasterizer draws the
series onto a small canvas and the native ``png_lite`` encoder emits
real PNG bytes — no matplotlib, no PIL, deterministic output (so
thumbnails are content-addressable and re-runs never churn storage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

THUMBNAIL_SCHEMA = (
    "file string, sweep_id string, channel string, width int, height int, "
    "n_samples int, content binary"
)


def rasterize_series(
    values: np.ndarray, width: int = 256, height: int = 64
) -> np.ndarray:
    """Polyline raster of a 1-D series on a (height, width) grayscale
    canvas (255 background, 0 trace). Columns map to sample positions,
    rows to the min-max-normalized value; consecutive samples connect
    through linear interpolation so the trace is gap-free."""
    canvas = np.full((height, width), 255, dtype=np.uint8)
    v = np.asarray(values, dtype=np.float64)
    if v.size == 0:
        return canvas
    lo, hi = float(v.min()), float(v.max())
    span = hi - lo if hi > lo else 1.0
    # sample -> pixel coordinates
    xs = (
        np.linspace(0, width - 1, v.size)
        if v.size > 1
        else np.array([width // 2], dtype=np.float64)
    )
    ys = (height - 1) - (v - lo) / span * (height - 1)
    # draw each segment with enough interpolation steps to be gap-free
    for i in range(v.size - 1):
        steps = int(max(abs(xs[i + 1] - xs[i]), abs(ys[i + 1] - ys[i]))) + 1
        t = np.linspace(0.0, 1.0, steps + 1)
        px = np.round(xs[i] + (xs[i + 1] - xs[i]) * t).astype(int)
        py = np.round(ys[i] + (ys[i + 1] - ys[i]) * t).astype(int)
        canvas[py.clip(0, height - 1), px.clip(0, width - 1)] = 0
    if v.size == 1:
        canvas[int(round(ys[0])), int(round(xs[0]))] = 0
    return canvas


def sweep_thumbnails(
    sweeps: DataFrame, width: int = 256, height: int = 64
) -> DataFrame:
    """Long sweep table (``extract_sweeps`` output) -> one PNG thumbnail
    per (file, sweep, channel)."""
    from .png_lite import encode_png

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        canvas = rasterize_series(pdf["value"].to_numpy(), width, height)
        return pd.DataFrame(
            [
                {
                    "file": pdf["file"].iloc[0],
                    "sweep_id": pdf["sweep_id"].iloc[0],
                    "channel": pdf["channel"].iloc[0],
                    "width": width,
                    "height": height,
                    "n_samples": len(pdf),
                    "content": bytearray(encode_png(canvas)),
                }
            ]
        )

    return sweeps.groupBy("file", "sweep_id", "channel").applyInPandas(
        one_group, schema=THUMBNAIL_SCHEMA
    )
