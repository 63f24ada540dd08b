"""Native HDF5 parser/writer: round trips, the checked-in golden NWB
fixture, chunked+gzip reading, and conformance against real
libhdf5-written files where present."""

from __future__ import annotations

import glob
import os
import struct
import zlib

import numpy as np
import pytest

from data_integration_pipelines_spark.sources.hdf5_lite import (
    Group,
    H5LiteFile,
    open_bytes,
    write_hdf5,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_sweeps.nwb")
REF_H5_DIR = "/root/reference/data/test_data/h5"


def test_roundtrip_types_groups_scalars():
    tree = {
        "grp": {
            "ints": np.arange(10, dtype=np.int32),
            "floats": np.linspace(0, 1, 7),
            "f32": np.float32(2.5),
            "deep": {"strs": np.array(["a", "longer-été", "c"])},
        },
        "scalar_int": 42,
        "scalar_str": "hello",
        "matrix": np.arange(12, dtype=np.float64).reshape(3, 4),
    }
    f = open_bytes(write_hdf5(tree))
    assert sorted(f.keys()) == ["grp", "matrix", "scalar_int", "scalar_str"]
    assert f["grp/ints"][()].tolist() == list(range(10))
    assert f["grp/ints"][()].dtype == np.int64  # widened on write
    np.testing.assert_allclose(f["grp/floats"][()], np.linspace(0, 1, 7))
    assert f["grp/f32"][()] == np.float32(2.5)
    assert f["grp/deep/strs"][()].tolist() == ["a", "longer-été", "c"]
    assert f["scalar_int"][()] == 42
    assert f["scalar_str"][()] == "hello"
    assert f["matrix"].shape == (3, 4)
    np.testing.assert_array_equal(
        f["matrix"][()], np.arange(12.0).reshape(3, 4)
    )
    # path membership, group API
    assert "grp/deep" in f and "grp/nope" not in f
    assert isinstance(f["grp"], Group)
    with pytest.raises(KeyError):
        f["grp/missing"]


def test_golden_fixture_parses():
    """The checked-in golden NWB-layout fixture must parse and expose
    the reference's access pattern (stimulus table + sweep series)."""
    f = open_bytes(open(GOLDEN, "rb").read())
    st = "general/intracellular_ephys/sequential_recordings/stimulus_type"
    assert st in f
    assert f[st][()].tolist() == ["IDRest", "APWaveform", "IV"]
    assert sorted(f["acquisition"].keys()) == ["sweep0", "sweep1", "sweep2"]
    assert f["acquisition/sweep1/rate"][()] == 20000.0
    assert len(f["acquisition/sweep0/channel_v/data"][()]) == 16


def test_reads_chunked_gzip_dataset():
    """Hand-built chunked dataset (layout class 2 + deflate filter +
    chunk B-tree with a partial edge chunk) — the combination h5py
    writes for compressed data; our writer never emits it, so build the
    structures directly against the format spec."""
    values = np.arange(10, dtype="<i8")
    chunk_elems = 4
    base = write_hdf5({"placeholder": 0})  # superblock + root scaffolding
    buf = bytearray(base)

    def alloc(data: bytes) -> int:
        while len(buf) % 8:
            buf.append(0)
        addr = len(buf)
        buf.extend(data)
        return addr

    # chunks (deflated)
    chunk_addrs, chunk_sizes, coords = [], [], []
    for start in range(0, len(values), chunk_elems):
        piece = values[start : start + chunk_elems]
        raw = piece.tobytes() + b"\x00" * ((chunk_elems - len(piece)) * 8)
        comp = zlib.compress(raw)
        chunk_addrs.append(alloc(comp))
        chunk_sizes.append(len(comp))
        coords.append(start)
    # chunk B-tree: node type 1, level 0; keys = size,mask,offset0,elem0
    bt = bytearray(b"TREE" + struct.pack("<BBHQQ", 1, 0, len(chunk_addrs), 0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF))
    for addr, size, c0 in zip(chunk_addrs, chunk_sizes, coords):
        bt += struct.pack("<IIQQ", size, 0, c0, 0)  # key
        bt += struct.pack("<Q", addr)  # child
    bt += struct.pack("<IIQQ", 0, 0, len(values), 0)  # final key
    btree_addr = alloc(bytes(bt))

    # dataset object header: dataspace, datatype, filter pipeline v1
    # (deflate), chunked layout v3
    def msg(mtype, body):
        pad = (-len(body)) % 8
        return struct.pack("<HHB3x", mtype, len(body) + pad, 0) + body + b"\x00" * pad

    space = struct.pack("<BBB5xQ", 1, 1, 0, len(values))
    dtype = struct.pack("<B3BI2H", 0x10, 0x08, 0, 0, 8, 0, 64)
    name = b"deflate\x00"
    filt = struct.pack("<BB6x", 1, 1) + struct.pack(
        "<HHHH", 1, len(name), 1, 1
    ) + name + struct.pack("<I", 6) + b"\x00" * 4  # 1 cd value (level) + odd pad
    layout = struct.pack("<BBBQII", 3, 2, 2, btree_addr, chunk_elems, 8)
    msgs = [msg(0x0001, space), msg(0x0003, dtype), msg(0x000B, filt), msg(0x0008, layout)]
    block = b"".join(msgs)
    ohdr = alloc(struct.pack("<BxHII4x", 1, len(msgs), 1, len(block)) + block)

    # splice the dataset into the root group by rewriting the SNOD entry
    # of "placeholder" to point at our chunked dataset's header
    f0 = H5LiteFile(bytes(buf))
    snod_pos = bytes(buf).find(b"SNOD")
    entry = snod_pos + 8
    buf[entry + 8 : entry + 16] = struct.pack("<Q", ohdr)

    f = open_bytes(bytes(buf))
    assert f["placeholder"][()].tolist() == list(range(10))


@pytest.mark.skipif(
    not os.path.isdir(REF_H5_DIR), reason="reference h5 test data not present"
)
def test_reads_real_libhdf5_files():
    """Conformance: every libhdf5-written morphology file in the
    reference's public test data must parse (groups, 2-D datasets,
    int32/float64, nested v2 layout)."""
    paths = sorted(glob.glob(f"{REF_H5_DIR}/**/*.h5", recursive=True))
    assert paths
    for p in paths:
        f = open_bytes(open(p, "rb").read())
        keys = list(f.keys())
        assert keys, p
        # v1 layout: points/structure at root; v2: nested one level
        if "points" in keys:
            pts = f["points"][()]
            assert pts.ndim == 2 and pts.shape[1] == 4, p
        else:
            sub = f[keys[0]]
            assert isinstance(sub, Group)


@pytest.mark.realdeps
def test_h5py_reads_our_golden_fixture():
    """Wherever h5py exists, libhdf5 itself must accept the writer's
    classic-format output."""
    h5py = pytest.importorskip("h5py")
    with h5py.File(GOLDEN, "r") as f:
        st = "general/intracellular_ephys/sequential_recordings/stimulus_type"
        assert [s.decode() for s in f[st][()]] == ["IDRest", "APWaveform", "IV"]
        assert f["acquisition/sweep1/rate"][()] == 20000.0


def test_golden_v2_fixture_parses():
    """The checked-in hierarchical-icephys fixture (second NWB layout
    the reference reads) must expose the table chain and its ragged
    index columns."""
    v2 = os.path.join(os.path.dirname(__file__), "fixtures", "golden_sweeps_v2.nwb")
    f = open_bytes(open(v2, "rb").read())
    base = "general/intracellular_ephys"
    assert f[f"{base}/repetitions/id"][()].tolist() == [1, 2]
    assert f[f"{base}/repetitions/sequential_recordings_index"][()].tolist() == [2, 3]
    assert f[f"{base}/sequential_recordings/stimulus_type"][()].tolist() == [
        "IDRest", "APWaveform", "IV",
    ]
    assert f[f"{base}/simultaneous_recordings/recordings_index"][()].tolist() == [
        2, 3, 4, 6,
    ]
    assert len(f["acquisition"].keys()) == 6


@pytest.mark.realdeps
def test_h5py_chunked_and_nested_files_read_back():
    """Wherever h5py exists: libhdf5 writes a chunked+gzip dataset
    (explicit and auto-chosen chunk shapes, incl. a partial edge
    chunk) inside nested groups; the native parser must return the
    exact values. This is the libhdf5-written counterpart of the
    hand-built chunked fixture above."""
    h5py = pytest.importorskip("h5py")
    import tempfile

    vals = np.arange(1000, dtype=np.float64).reshape(50, 20) * 1.5
    ints = np.arange(37, dtype=np.int32)  # partial edge chunk at 16
    with tempfile.NamedTemporaryFile(suffix=".h5") as tmp:
        with h5py.File(tmp.name, "w") as f:
            g = f.create_group("outer").create_group("inner")
            g.create_dataset("mat", data=vals, chunks=(16, 7), compression="gzip")
            g.create_dataset("ints", data=ints, chunks=(16,), compression="gzip")
            f.create_dataset("auto", data=vals, chunks=True)
        got = open_bytes(open(tmp.name, "rb").read())
        np.testing.assert_array_equal(got["outer/inner/mat"][()], vals)
        np.testing.assert_array_equal(got["outer/inner/ints"][()], ints)
        np.testing.assert_array_equal(got["auto"][()], vals)


@pytest.mark.realdeps
def test_h5py_reads_our_v2_fixture():
    h5py = pytest.importorskip("h5py")
    v2 = os.path.join(os.path.dirname(__file__), "fixtures", "golden_sweeps_v2.nwb")
    with h5py.File(v2, "r") as f:
        base = "general/intracellular_ephys"
        assert f[f"{base}/repetitions/id"][()].tolist() == [1, 2]
        assert [
            s.decode() for s in f[f"{base}/sequential_recordings/stimulus_type"][()]
        ] == ["IDRest", "APWaveform", "IV"]
        assert f["acquisition/sweep3_i/rate"][()] == 50000.0


def test_rejects_malformed_inputs():
    good = write_hdf5({"x": np.arange(4)})
    with pytest.raises(ValueError, match="signature"):
        open_bytes(b"PK\x03\x04 not hdf5 at all----")
    # flip superblock version byte -> loud failure, not garbage data
    bad_ver = bytearray(good)
    bad_ver[8] = 2
    with pytest.raises(ValueError, match="superblock version"):
        open_bytes(bytes(bad_ver))
    # truncated mid-structure -> parse error, not silent truncation
    with pytest.raises(Exception):
        f = open_bytes(good[: len(good) // 3])
        f["x"][()]
