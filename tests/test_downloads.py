"""Download manager tests (role parity: crates/download-manager reducer +
lock + CRC + resume, exercised offline with file:// manifests like the
reference's mock-registry)."""

import json
import os

import numpy as np
import pytest

from uzu_tpu.engine.downloads import (
    Action,
    DirLock,
    DownloadError,
    FileSpec,
    LockError,
    download_file,
    download_model,
    file_crc32,
    manifest_for_dir,
    plan,
)


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    rng = np.random.default_rng(0)
    (d / "model.safetensors").write_bytes(rng.integers(0, 256, 100_000, np.uint8).tobytes())
    (d / "config.json").write_text(json.dumps({"hello": 1}))
    return str(d)


def test_manifest_and_full_download(src, tmp_path):
    dest = str(tmp_path / "dest")
    files = manifest_for_dir(src)
    assert {f.name for f in files} == {"model.safetensors", "config.json"}
    paths = download_model(files, dest)
    for f, p in zip(files, paths):
        assert os.path.getsize(p) == f.size
        assert file_crc32(p) == f.crc32
    # second run: everything planned as done
    assert all(plan(f, dest).kind == "done" for f in files)


def test_resume_from_partial(src, tmp_path):
    dest = str(tmp_path / "dest")
    os.makedirs(dest)
    [spec] = [f for f in manifest_for_dir(src) if f.name == "model.safetensors"]
    # simulate an interrupted transfer: correct prefix on disk
    with open(os.path.join(src, spec.name), "rb") as f:
        prefix = f.read(40_000)
    with open(os.path.join(dest, spec.name + ".part"), "wb") as f:
        f.write(prefix)
    assert plan(spec, dest) == Action("resume", offset=40_000)
    path = download_file(spec, dest)
    assert file_crc32(path) == spec.crc32


def test_corrupt_final_restarts(src, tmp_path):
    dest = str(tmp_path / "dest")
    os.makedirs(dest)
    [spec] = [f for f in manifest_for_dir(src) if f.name == "config.json"]
    with open(os.path.join(dest, spec.name), "w") as f:
        f.write("garbage of the right length?")
    assert plan(spec, dest).kind == "restart"
    path = download_file(spec, dest)
    assert file_crc32(path) == spec.crc32


def test_oversized_partial_restarts(src, tmp_path):
    dest = str(tmp_path / "dest")
    os.makedirs(dest)
    [spec] = [f for f in manifest_for_dir(src) if f.name == "config.json"]
    with open(os.path.join(dest, spec.name + ".part"), "wb") as f:
        f.write(b"x" * (spec.size + 10))
    assert plan(spec, dest).kind == "restart"
    path = download_file(spec, dest)
    assert file_crc32(path) == spec.crc32


def test_lock_excludes_and_breaks_stale(tmp_path):
    dest = str(tmp_path / "d")
    os.makedirs(dest)
    with DirLock(dest):
        with pytest.raises(LockError):
            with DirLock(dest):
                pass
    # stale lock: dead pid
    lock_path = os.path.join(dest, ".uzu_download.lock")
    with open(lock_path, "w") as f:
        json.dump({"pid": 2**22 + 12345, "time": 0}, f)
    with DirLock(dest):
        pass  # stale lock broken
    assert not os.path.exists(lock_path)
