"""HTTP JSON source (reference S10, hardware_report.py:189-218) and
packaged static resources (S11, annotations.py:92-93).

External fetches stay driver-side (exactly as the reference's
``fetch_json``): the result is a small dict that becomes a broadcast
dim table. The transport is injectable so tests (and air-gapped runs)
never touch the network.
"""

from __future__ import annotations

import importlib.resources
import json
import urllib.request
from collections.abc import Callable


def fetch_json(uri: str, opener: Callable[[str], bytes] | None = None) -> dict:
    """GET ``uri`` and parse JSON; raises on HTTP errors. ``opener``
    overrides the transport (tests pass a fake; default is urllib)."""
    if opener is None:
        def opener(u: str) -> bytes:  # pragma: no cover - network
            with urllib.request.urlopen(u) as resp:
                if resp.status >= 400:
                    raise RuntimeError(f"HTTP {resp.status} fetching {u}")
                return resp.read()

    return json.loads(opener(uri))


def read_static_json(name: str) -> dict | list:
    """S11: bundled static resource from the package's ``static/``
    directory (reference pkg_resources.read_text equivalent)."""
    pkg = "firefox_public_data_report_etl_spark.static"
    return json.loads(importlib.resources.files(pkg).joinpath(name).read_text())
