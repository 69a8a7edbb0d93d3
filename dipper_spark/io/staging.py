"""S1 staging layer: conditional fetch with Last-Modified / Content-Length
freshness, plus the web-cache fallback chain.

Reference: dipper/sources/Source.py —
``check_if_remote_is_newer`` (280-358: remote probe; missing local file →
fetch; Last-Modified newer than the local ctime → compare sizes; no
Last-Modified → size mismatch decides), ``fetch_from_url`` (435-494:
conditional chunked download + the downloaded-size-equals-remote-size
integrity check), ``get_files`` (361-432: per-file loop trying the
project's web cache before the origin URL).

Driver-side by design: staging is network IO, not a cluster op (SURVEY
§2.1 S1) — the cluster scans what staging lands in ``raw_dir``.
"""

from __future__ import annotations

import logging
import os
import urllib.error
import urllib.request
from datetime import datetime, timezone

LOG = logging.getLogger(__name__)
CHUNK = 16 * 1024
_HEADERS = {"User-Agent": "dipper-spark/2.0"}


def _remote_info(remote: str, headers: dict | None = None):
    """(size, last_modified datetime|None) for a url, or None on error."""
    req = urllib.request.Request(remote, headers=headers or _HEADERS)
    try:
        with urllib.request.urlopen(req) as response:
            info = response.info()
            size = info.get("Content-Length")
            size = int(size) if size not in (None, "") else 0
            last_modified = info.get("Last-Modified")
            dt = (
                datetime.strptime(last_modified, "%a, %d %b %Y %H:%M:%S %Z")
                if last_modified
                else None
            )
            return size, dt
    except urllib.error.URLError as err:
        LOG.error("%s\n\tFor: %s", err, remote)
        return None


def check_if_remote_is_newer(
    remote: str, local: str, headers: dict | None = None
) -> bool | None:
    """True → download; False → keep local; None → remote unreachable
    (Source.check_if_remote_is_newer, Source.py:280-358)."""
    if not os.path.exists(local):
        return True
    probe = _remote_info(remote, headers)
    if probe is None:
        return None
    size, last_modified = probe
    fstat = os.stat(local)
    local_dt = datetime.utcfromtimestamp(fstat.st_ctime)
    if last_modified is not None:
        if last_modified > local_dt and fstat.st_size != size:
            return True
        return False
    # no Last-Modified header: size mismatch decides (Source.py:352-356)
    return fstat.st_size != size


def fetch_from_url(
    remote: str, local: str, is_dl_forced: bool = False, headers: dict | None = None
) -> bool:
    """Conditional download with the size integrity check
    (Source.fetch_from_url, Source.py:435-494).  Returns True when the local
    file is fresh (downloaded now or already current)."""
    rmt_check = check_if_remote_is_newer(remote, local, headers)
    if not (is_dl_forced or (rmt_check is not None and rmt_check)):
        if rmt_check is False:
            LOG.info("Using existing file %s", local)
            return True
        return False  # unreachable and no decision to reuse
    req = urllib.request.Request(remote, headers=headers or _HEADERS)
    try:
        response = urllib.request.urlopen(req)
    except urllib.error.URLError as err:
        LOG.error("NETWORK issue %s\n\tFor: %s", err, remote)
        return False
    os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
    expected = response.info().get("Content-Length")
    with response, open(local, "wb") as out:
        while True:
            chunk = response.read(CHUNK)
            if not chunk:
                break
            out.write(chunk)
    if expected not in (None, "") and os.stat(local).st_size != int(expected):
        raise OSError(
            f"Error downloading {remote}: local file size != remote file size"
        )
    LOG.info("Finished.  Wrote file to %s", local)
    return True


def stage_files(
    pipeline,
    raw_dir: str,
    *,
    is_dl_forced: bool = False,
    cache_base: str | None = None,
) -> dict[str, str]:
    """Stage every file a pipeline declares (Source.get_files,
    Source.py:361-432): try ``<cache_base>/<source>/<file>`` first, then the
    origin url.  Returns {file_key: 'cache'|'origin'|'existing'|'missing'}.
    Files with no url (curated local inputs) report 'missing' unless already
    present."""
    report: dict[str, str] = {}
    os.makedirs(raw_dir, exist_ok=True)
    for key, contract in pipeline.files.items():
        local = f"{raw_dir.rstrip('/')}/{contract.file}"
        if cache_base:
            cached = f"{cache_base.rstrip('/')}/{pipeline.name}/{contract.file}"
            if fetch_from_url(cached, local, is_dl_forced):
                report[key] = "cache"
                continue
        if not contract.url:
            report[key] = "existing" if os.path.exists(local) else "missing"
            continue
        if os.path.exists(local) and not is_dl_forced:
            probe = check_if_remote_is_newer(contract.url, local)
            if probe is not True:
                report[key] = "existing"
                continue
        report[key] = (
            "origin" if fetch_from_url(contract.url, local, is_dl_forced) else "missing"
        )
    return report
