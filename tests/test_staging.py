"""S1 staging: conditional fetch with Last-Modified/Content-Length
freshness, web-cache fallback, end-to-end --fetch ETL (reference
Source.check_if_remote_is_newer/fetch_from_url/get_files,
Source.py:280-494)."""

import gzip
import os
import threading
import time
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from dipper_spark.io.staging import check_if_remote_is_newer, fetch_from_url, stage_files


class _Handler(BaseHTTPRequestHandler):
    #: path -> (bytes, last_modified_epoch | None)
    FILES: dict = {}
    hits: list = []

    def do_GET(self):  # noqa: N802 - http.server API
        entry = self.FILES.get(self.path)
        type(self).hits.append(self.path)
        if entry is None:
            self.send_response(404)
            self.end_headers()
            return
        payload, mtime = entry
        self.send_response(200)
        self.send_header("Content-Length", str(len(payload)))
        if mtime is not None:
            self.send_header("Last-Modified", formatdate(mtime, usegmt=True))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture(scope="module")
def http_server():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


class TestConditionalFetch:
    def test_missing_local_downloads(self, http_server, tmp_path):
        _Handler.FILES["/a.txt"] = (b"hello", time.time())
        local = str(tmp_path / "a.txt")
        assert check_if_remote_is_newer(f"{http_server}/a.txt", local) is True
        assert fetch_from_url(f"{http_server}/a.txt", local)
        assert open(local).read() == "hello"

    def test_fresh_local_not_redownloaded(self, http_server, tmp_path):
        # remote older than local and same size -> keep local
        _Handler.FILES["/b.txt"] = (b"12345", time.time() - 86400)
        local = str(tmp_path / "b.txt")
        with open(local, "w") as fh:
            fh.write("12345")
        assert check_if_remote_is_newer(f"{http_server}/b.txt", local) is False
        _Handler.hits.clear()
        assert fetch_from_url(f"{http_server}/b.txt", local)  # fresh, no GET body use
        # forced download always re-fetches
        assert fetch_from_url(f"{http_server}/b.txt", local, is_dl_forced=True)

    def test_no_last_modified_size_decides(self, http_server, tmp_path):
        _Handler.FILES["/c.txt"] = (b"123456789", None)
        local = str(tmp_path / "c.txt")
        with open(local, "w") as fh:
            fh.write("123")  # size differs -> newer
        assert check_if_remote_is_newer(f"{http_server}/c.txt", local) is True
        assert fetch_from_url(f"{http_server}/c.txt", local)
        assert os.stat(local).st_size == 9
        # now sizes match -> not newer
        assert check_if_remote_is_newer(f"{http_server}/c.txt", local) is False

    def test_unreachable_remote(self, tmp_path):
        local = str(tmp_path / "gone.txt")
        with open(local, "w") as fh:
            fh.write("cached")
        assert check_if_remote_is_newer("http://127.0.0.1:9/x", local) is None
        # unreachable + local exists -> no download, not fresh-confirmed
        assert fetch_from_url("http://127.0.0.1:9/x", local) is False


class TestStageFiles:
    def test_cache_then_origin_chain(self, http_server, tmp_path):
        from dipper_spark.sources import get_pipeline

        pipe = get_pipeline("ctd")
        fname = pipe.files["chemical_disease"].file
        payload = gzip.compress(b"Nicotine\tD009538\t\tT\tOMIM:188890\ttherapeutic\t\t\t\t12345\n")
        # only the CACHE url carries the file; origin URL (ctdbase.org) is
        # never touched because the cache hit short-circuits
        _Handler.FILES[f"/ctd/{fname}"] = (payload, time.time())
        raw = str(tmp_path / "raw")
        report = stage_files(pipe, raw, cache_base=http_server)
        assert report == {"chemical_disease": "cache"}
        assert os.path.exists(f"{raw}/{fname}")

    def test_existing_files_reported(self, tmp_path):
        from dipper_spark.sources import get_pipeline

        pipe = get_pipeline("monarch")  # curated files, url=None
        raw = tmp_path / "raw2"
        raw.mkdir()
        (raw / "OMIA-disease-phenotype").mkdir()
        report = stage_files(pipe, str(raw))
        assert report == {"omia_d2p": "existing"}


class TestEtlFetchEndToEnd:
    def test_fetch_then_transform(self, spark, http_server, tmp_path):
        """etl --fetch stages from the fixture cache then transforms —
        the S1 'CLI can actually stage real data' gap (VERDICT r1 #3)."""
        from dipper_spark.etl import run

        fname = "CTD_chemicals_diseases.tsv.gz"
        payload = gzip.compress(
            b"Nicotine\tD009538\t\tTOBACCO ADDICTION\tOMIM:188890\ttherapeutic\t\t\t\t12345|56789\n"
        )
        _Handler.FILES[f"/ctd/{fname}"] = (payload, time.time())
        raw, out = str(tmp_path / "raw"), str(tmp_path / "out")
        report = run(
            [
                "--sources", "ctd", "--raw-dir", raw, "--out-dir", out,
                "--dest-fmt", "nt", "--fetch", "--cache-base", http_server,
            ],
            spark=spark,
        )
        assert "fetch" in report["sources"]["ctd"]
        lines = []
        for name in sorted(os.listdir(f"{out}/ctd.nt")):
            if name.startswith("part-"):
                lines += open(f"{out}/ctd.nt/{name}").read().splitlines()
        assert any("RO_0002606" in ln and "188890" in ln for ln in lines)
