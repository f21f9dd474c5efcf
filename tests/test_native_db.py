"""Native C++ KV engine: roundtrip, durability, FileDb interop."""

import shutil

import pytest

from eigen_zeth_tpu.protocol import kv


g_pp_missing = shutil.which("g++") is None
pytestmark = pytest.mark.skipif(g_pp_missing, reason="g++ not available")


def make_native(path):
    from eigen_zeth_tpu.native.zethdb import NativeDb

    return NativeDb(str(path))


def test_native_roundtrip(tmp_path):
    db = make_native(tmp_path / "n.log")
    db.put(b"a", b"1")
    db.put(b"a", b"2")  # overwrite
    db.put(b"b", b"\x00\xff" * 100)
    assert db.get(b"a") == b"2"
    assert db.get(b"b") == b"\x00\xff" * 100
    assert db.delete(b"a") == b"2"
    assert db.get(b"a") is None
    assert db.count() == 1
    db.close()


def test_native_durability(tmp_path):
    p = tmp_path / "d.log"
    db = make_native(p)
    db.put_u64(kv.KEY_NEXT_BATCH, 9)
    db.put_status(4, kv.Status.Submitted)
    db.close()
    db2 = make_native(p)
    assert db2.get_u64(kv.KEY_NEXT_BATCH) == 9
    assert db2.get_status(4) == kv.Status.Submitted
    db2.close()


def test_native_filedb_interop(tmp_path):
    """Same log format: python writes, native reads — and back."""
    p = str(tmp_path / "x.log")
    fdb = kv.FileDb(p)
    fdb.put(b"k1", b"v1")
    fdb.put(b"k2", b"v2")
    fdb.delete(b"k1")
    fdb.close()

    ndb = make_native(p)
    assert ndb.get(b"k1") is None
    assert ndb.get(b"k2") == b"v2"
    ndb.put(b"k3", b"v3")
    ndb.close()

    fdb2 = kv.FileDb(p)
    assert fdb2.get(b"k3") == b"v3"
    assert fdb2.get(b"k2") == b"v2"
    fdb2.close()


def test_open_db_native_factory(tmp_path):
    db = kv.open_db("native", str(tmp_path / "f.log"))
    db.put(b"z", b"9")
    assert db.get(b"z") == b"9"
