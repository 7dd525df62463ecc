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


# -- HTTP fault injection (reference: mock-registry wiremock Behavior matrix,
# crates/mock-registry/src/behavior.rs) ---------------------------------------


class _FaultyHandler:
    """http.server handler factory with a scripted behavior queue.

    Behaviors (consumed one per request): "ok", "error500", "truncate:<n>"
    (send headers for the full size but close after n bytes), "garbage"
    (serve wrong bytes of the right length). Range requests are honored
    with 206 + offset serving.
    """

    def __init__(self, payload: bytes):
        self.payload = payload
        self.script: list[str] = []
        self.requests: list[str] = []

    def make(self):
        import http.server

        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                behavior = outer.script.pop(0) if outer.script else "ok"
                outer.requests.append(
                    f"{behavior}:{self.headers.get('Range', '-')}")
                data = outer.payload
                if behavior == "error500":
                    self.send_response(500)
                    self.end_headers()
                    return
                if behavior == "garbage":
                    data = bytes((b ^ 0xFF) for b in data)
                offset = 0
                rng = self.headers.get("Range")
                status = 200
                if rng and rng.startswith("bytes="):
                    offset = int(rng.split("=")[1].rstrip("-"))
                    status = 206
                body = data[offset:]
                self.send_response(status)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if behavior.startswith("truncate:"):
                    n = int(behavior.split(":")[1])
                    self.wfile.write(body[:n])
                    self.wfile.flush()
                    self.connection.close()
                    return
                self.wfile.write(body)

        return H


def _serve(payload: bytes):
    import http.server
    import threading

    factory = _FaultyHandler(payload)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), factory.make())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/file.bin"
    return factory, httpd, url


@pytest.fixture()
def payload():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, 50_000, np.uint8).tobytes()


def _spec(url, payload):
    import zlib

    return FileSpec(name="file.bin", url=url, size=len(payload),
                    crc32=zlib.crc32(payload) & 0xFFFFFFFF)


def test_http_500_then_success(payload, tmp_path):
    factory, httpd, url = _serve(payload)
    try:
        factory.script = ["error500", "ok"]
        final = download_file(_spec(url, payload), str(tmp_path))
        assert open(final, "rb").read() == payload
        assert len(factory.requests) == 2
    finally:
        httpd.shutdown()


def test_mid_transfer_truncation_resumes_with_range(payload, tmp_path):
    """A dropped connection mid-file must RESUME from the received bytes
    via a Range request, not restart from zero."""
    factory, httpd, url = _serve(payload)
    try:
        factory.script = ["truncate:20000", "ok"]
        final = download_file(_spec(url, payload), str(tmp_path))
        assert open(final, "rb").read() == payload
        # second request carried a Range header at (or before) 20000
        assert len(factory.requests) == 2
        rng_hdr = factory.requests[1].split(":", 1)[1]
        assert rng_hdr.startswith("bytes=") and rng_hdr != "-"
        assert 0 < int(rng_hdr.split("=")[1].rstrip("-")) <= 20000
    finally:
        httpd.shutdown()


def test_garbage_payload_fails_crc_then_recovers(payload, tmp_path):
    factory, httpd, url = _serve(payload)
    try:
        factory.script = ["garbage", "ok"]
        final = download_file(_spec(url, payload), str(tmp_path))
        assert open(final, "rb").read() == payload
    finally:
        httpd.shutdown()


def test_persistent_failure_raises(payload, tmp_path):
    factory, httpd, url = _serve(payload)
    try:
        factory.script = ["error500", "error500"]
        with pytest.raises(DownloadError):
            download_file(_spec(url, payload), str(tmp_path))
    finally:
        httpd.shutdown()
