"""Regenerate the golden NWB-layout HDF5 fixture (tests/fixtures/
golden_sweeps.nwb) with the native writer. Deterministic: same bytes
every run, so the checked-in file never churns."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from data_integration_pipelines_spark.sources.hdf5_lite import write_hdf5  # noqa: E402

OUT = "tests/fixtures/golden_sweeps.nwb"


def tree() -> dict:
    def series(seed: int, n: int) -> np.ndarray:
        # deterministic pseudo-signal, no RNG state dependence
        ts = np.arange(n, dtype=np.float64)
        return np.round(np.sin(ts * 0.1 + seed) * 100.0, 6)

    return {
        "identifier": "golden-cell-001",
        "general": {
            "intracellular_ephys": {
                "sequential_recordings": {
                    "stimulus_type": np.array(["IDRest", "APWaveform", "IV"]),
                }
            }
        },
        "acquisition": {
            "sweep0": {
                "rate": 10000.0,
                "repetition": np.int64(1),
                "channel_v": {"data": series(0, 16), "conversion": 1.0},
                "channel_i": {"data": series(1, 16), "conversion": 1e-12},
            },
            "sweep1": {
                "rate": 20000.0,
                "repetition": np.int64(2),
                "channel_v": {"data": series(2, 8), "conversion": 1.0},
            },
            "sweep2": {
                "rate": 10000.0,
                "repetition": np.int64(1),
                "channel_i": {"data": series(3, 4), "conversion": 1e-12},
            },
        },
    }


if __name__ == "__main__":
    import os

    os.makedirs("tests/fixtures", exist_ok=True)
    data = write_hdf5(tree(), OUT)
    print(f"wrote {OUT}: {len(data)} bytes")
