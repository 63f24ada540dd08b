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


OUT_V2 = "tests/fixtures/golden_sweeps_v2.nwb"


def tree_v2() -> dict:
    """NWB-2 hierarchical icephys sweep tables: repetitions ->
    sequential_recordings -> simultaneous_recordings ->
    intracellular_recordings -> /acquisition series, linked through
    DynamicTable ragged-index columns (cumulative end offsets).

    Shape: repetition 1 holds sequential recordings 0 (IDRest: two
    simultaneous sets -> 3 recordings) and 1 (APWaveform: 1 -> 1);
    repetition 2 holds sequential recording 2 (IV: 1 -> 2).
    """

    def series(seed: int, n: int) -> np.ndarray:
        ts = np.arange(n, dtype=np.float64)
        return np.round(np.cos(ts * 0.2 + seed) * 50.0, 6)

    def acq(rate: float, conv: float, seed: int, n: int) -> dict:
        return {"rate": rate, "conversion": conv, "data": series(seed, n)}

    return {
        "identifier": "golden-cell-002",
        "general": {
            "intracellular_ephys": {
                "repetitions": {
                    "id": np.array([1, 2], dtype=np.int64),
                    "sequential_recordings_index": np.array([2, 3], dtype=np.int64),
                },
                "sequential_recordings": {
                    "id": np.array([0, 1, 2], dtype=np.int64),
                    "stimulus_type": np.array(["IDRest", "APWaveform", "IV"]),
                    "simultaneous_recordings_index": np.array(
                        [2, 3, 4], dtype=np.int64
                    ),
                },
                "simultaneous_recordings": {
                    "id": np.array([0, 1, 2, 3], dtype=np.int64),
                    "recordings_index": np.array([2, 3, 4, 6], dtype=np.int64),
                },
                "intracellular_recordings": {
                    "id": np.array([0, 1, 2, 3, 4, 5], dtype=np.int64),
                    "responses_response": np.array(
                        [
                            "sweep0_v",
                            "sweep0_i",
                            "sweep1_v",
                            "sweep2_v",
                            "sweep3_v",
                            "sweep3_i",
                        ]
                    ),
                },
            }
        },
        "acquisition": {
            "sweep0_v": acq(10000.0, 1.0, 0, 6),
            "sweep0_i": acq(10000.0, 1e-12, 1, 6),
            "sweep1_v": acq(20000.0, 1.0, 2, 4),
            "sweep2_v": acq(10000.0, 1.0, 3, 5),
            "sweep3_v": acq(50000.0, 1.0, 4, 3),
            "sweep3_i": acq(50000.0, 1e-12, 5, 3),
        },
    }


if __name__ == "__main__":
    import os

    os.makedirs("tests/fixtures", exist_ok=True)
    data = write_hdf5(tree(), OUT)
    print(f"wrote {OUT}: {len(data)} bytes")
    data2 = write_hdf5(tree_v2(), OUT_V2)
    print(f"wrote {OUT_V2}: {len(data2)} bytes")
