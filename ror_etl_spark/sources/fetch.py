"""ROR data-dump source connector (reference: ror_scripts/fetch.py).

Reference behavior (S1–S5 of SURVEY §2.1):
- fetch.py:19-23 — GET the Zenodo records API for the ror-data community,
  newest first; the newest record's first file link is the dump URL.
- fetch.py:24-31 — download the zip, extract to a temp dir.
- fetch.py:32-35 — exactly one ``*.json`` not containing "schema" must
  exist (hard assert).
- fetch.py:36-41 — the dump is one JSON array; re-emit as JSONL.
- fetch.py:42-45 — upload to object storage.

Spark-first restatement: the URL discovery is a driver-side scalar (there
is nothing to distribute); the payload lands as a local file and is
then read by ``spark.read.schema(...).json`` — JSONL is line-splittable so
a 100 TB dump would parallelize across executors, which the reference's
whole-array ``json.loads`` (fetch.py:37) cannot. The array→JSONL rewrite
is therefore OPTIONAL here: Spark reads the raw array directly with
``multiLine=true`` (single-task per file) or the converted JSONL in
parallel; we convert, matching the reference's wire format.

Network access is isolated behind ``ZenodoClient`` so tests (and this
offline build environment) use ``LocalDumpClient`` with a file fixture.
"""

from __future__ import annotations

import json
import os
import tempfile
import zipfile
from dataclasses import dataclass
from typing import Protocol

ZENODO_API = "https://zenodo.org/api/records/?communities=ror-data&sort=mostrecent"


class DumpClient(Protocol):
    def latest_dump_url(self) -> str: ...

    def download(self, url: str, dest_dir: str) -> str:
        """Fetch url into dest_dir, return the local file path."""
        ...


@dataclass
class ZenodoClient:
    """Real network client (requires ``requests``; import-gated so the
    offline environment never touches it)."""

    api_url: str = ZENODO_API

    def latest_dump_url(self) -> str:
        import requests

        records = requests.get(self.api_url, timeout=60).json()
        # newest record's first file, as the reference picks it (fetch.py:23)
        return records["hits"]["hits"][0]["files"][0]["links"]["self"]

    def download(self, url: str, dest_dir: str) -> str:
        import requests

        local = os.path.join(dest_dir, os.path.basename(url) or "dump.zip")
        with requests.get(url, stream=True, timeout=600) as r:
            r.raise_for_status()
            with open(local, "wb") as f:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk)
        return local


@dataclass
class LocalDumpClient:
    """Offline fake: 'downloads' a local zip (or raw .json) fixture."""

    path: str

    def latest_dump_url(self) -> str:
        return self.path

    def download(self, url: str, dest_dir: str) -> str:
        return url


def pick_data_json(extract_dir: str) -> str:
    """Exactly one non-schema ``*.json`` must exist (fetch.py:32-35)."""
    candidates = [
        f
        for f in os.listdir(extract_dir)
        if f.endswith(".json") and "schema" not in f
    ]
    assert len(candidates) == 1, f"expected exactly one data json, got {candidates}"
    return os.path.join(extract_dir, candidates[0])


def json_array_to_jsonl(src: str, dest: str) -> int:
    """Whole-file JSON array → JSONL, one object per line (fetch.py:36-41).
    Returns the record count."""
    with open(src) as f:
        records = json.load(f)
    with open(dest, "w") as out:
        for rec in records:
            out.write(json.dumps(rec) + "\n")
    return len(records)


def fetch_to_jsonl(client: DumpClient, output_path: str) -> int:
    """Full S1–S5 flow: discover → download → extract → pick → JSONL."""
    url = client.latest_dump_url()
    with tempfile.TemporaryDirectory() as tmp:
        local = client.download(url, tmp)
        if local.endswith(".zip"):
            with zipfile.ZipFile(local) as z:
                z.extractall(tmp)
            data_json = pick_data_json(tmp)
        else:
            data_json = local
        return json_array_to_jsonl(data_json, output_path)
