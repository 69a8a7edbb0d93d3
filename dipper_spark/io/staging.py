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


def split_xml_stanzas(
    src: str,
    row_tag: str,
    *,
    stanzas_per_chunk: int = 5000,
    out_dir: str | None = None,
) -> list[str]:
    """Chunk one (possibly gzipped) XML release into N stanza-aligned gzip
    files so the cluster scan parallelizes.

    The reference streams the whole release single-threaded
    (ClinVar.py:824-848 iterparse over one ~1.5 GB xml.gz); a Spark scan of
    an unsplittable gzip has the same one-task bound.  This S1 step splits
    the stream at ``</row_tag>`` boundaries — each chunk gets the original
    document header (XML decl + root open tag), a run of whole stanzas, and
    a synthesized root close — so ``read_xml_stanzas`` sees k independent
    well-formed files and runs k tasks with identical stanza content.

    Chunks land in ``<src>.split/part-NNNNN.xml.gz`` (the original file is
    left untouched, so freshness checks against the remote keep working);
    ``expand_split_inputs`` routes readers to the chunks when present.
    Driver-side streaming with bounded memory (one buffered block + the
    current stanza run).
    """
    import gzip
    import re

    out_dir = out_dir or src + ".split"
    os.makedirs(out_dir, exist_ok=True)
    opener = gzip.open if src.endswith(".gz") else open
    close_tag = f"</{row_tag}>"
    open_re = re.compile(rf"<{re.escape(row_tag)}[\s>/]")
    chunk_paths: list[str] = []
    header: str | None = None
    root_close = ""
    stanzas: list[str] = []

    def _flush() -> None:
        nonlocal stanzas
        if not stanzas:
            return
        path = os.path.join(out_dir, f"part-{len(chunk_paths):05d}.xml.gz")
        with gzip.open(path, "wt", encoding="utf-8") as out:
            out.write(header)
            out.writelines(stanzas)
            out.write(root_close)
        chunk_paths.append(path)
        stanzas = []

    with opener(src, "rt", encoding="utf-8", errors="replace") as fh:
        buf = ""
        while True:
            block = fh.read(1 << 20)
            if not block:
                break
            buf += block
            if header is None:
                m = open_re.search(buf)
                if m is None:
                    continue  # still inside the document header
                header = buf[: m.start()]
                roots = re.findall(r"<([A-Za-z_][\w.:-]*)[\s>]", header)
                root_close = f"\n</{roots[-1]}>\n" if roots else ""
                buf = buf[m.start():]
            while True:
                pos = buf.find(close_tag)
                if pos < 0:
                    break
                end = pos + len(close_tag)
                stanzas.append(buf[:end])
                buf = buf[end:]
                if len(stanzas) >= stanzas_per_chunk:
                    _flush()
    _flush()
    return chunk_paths


def expand_split_inputs(paths: list[str]) -> list[str]:
    """For each input file, prefer its ``<path>.split/part-*`` chunks when a
    split directory exists (written by ``split_xml_stanzas``)."""
    import glob as _glob

    out: list[str] = []
    for p in paths:
        d = p + ".split"
        if os.path.isdir(d):
            parts = sorted(_glob.glob(os.path.join(d, "part-*")))
            out.extend(parts or [p])
        elif os.path.isdir(p):
            continue  # a sibling .split dir matched by the caller's glob
        else:
            out.append(p)
    return out


def stage_files(
    pipeline,
    raw_dir: str,
    *,
    is_dl_forced: bool = False,
    cache_base: str | None = None,
) -> dict[str, str]:
    """Stage every file a pipeline declares (Source.get_files,
    Source.py:361-432): try ``<cache_base>/<source>/<file>`` first, then the
    origin url.  Returns {file_key: 'cache'|'origin'|'existing'|'missing'|
    'missing-optional'}.  Files with no url (curated local inputs) report
    missing unless already present.  Contracts declared ``optional`` degrade
    to 'missing-optional' at INFO; a REQUIRED file that cannot be staged is
    logged as a WARNING so callers see the pipeline will fail downstream."""
    report: dict[str, str] = {}
    os.makedirs(raw_dir, exist_ok=True)
    for key, contract in pipeline.files.items():
        local = f"{raw_dir.rstrip('/')}/{contract.file}"
        if cache_base:
            cached = f"{cache_base.rstrip('/')}/{pipeline.name}/{contract.file}"
            if fetch_from_url(cached, local, is_dl_forced):
                report[key] = "cache"
                _maybe_split(local, contract, fresh=True)
                continue
        if not contract.url:
            report[key] = "existing" if os.path.exists(local) else "missing"
            if report[key] == "existing":
                _maybe_split(local, contract, fresh=False)
            continue
        if os.path.exists(local) and not is_dl_forced:
            probe = check_if_remote_is_newer(contract.url, local)
            if probe is not True:
                report[key] = "existing"
                _maybe_split(local, contract, fresh=False)
                continue
        report[key] = (
            "origin" if fetch_from_url(contract.url, local, is_dl_forced) else "missing"
        )
        if report[key] == "origin":
            _maybe_split(local, contract, fresh=True)
    for key, status in report.items():
        if status != "missing":
            continue
        if pipeline.files[key].optional:
            report[key] = "missing-optional"
            LOG.info(
                "%s: optional file %s not staged; pipeline degrades as documented",
                pipeline.name, pipeline.files[key].file,
            )
        else:
            LOG.warning(
                "%s: REQUIRED file %s could not be staged; transform will fail",
                pipeline.name, pipeline.files[key].file,
            )
    return report


def _maybe_split(local: str, contract, *, fresh: bool) -> None:
    """Post-stage stanza split for contracts that declare ``split_tag``:
    re-split after every fresh download; reuse an existing split dir for an
    unchanged local file."""
    split_tag = getattr(contract, "split_tag", None)
    if not split_tag or not os.path.exists(local):
        return
    if not fresh and os.path.isdir(local + ".split"):
        return
    split_xml_stanzas(local, split_tag, stanzas_per_chunk=contract.split_stanzas)
