"""Production fetch callables for the HTTP jobs (stdlib urllib — no extra
dependency). Tests never import this module; they inject fixture fetchers.

Mirrors the reference's request shapes:
- typeahead: GET /typeahead?query=<outcode>&limit=20&exclude=STREET, 10 s
  timeout (dags/rightmove_outcodes.py:71-79)
- search: GET /property-for-sale/find.html?locationIdentifier=REGION^<id>
  &index=<offset>&maxDaysSinceAdded=1&dontShow=..., 15 s timeout, rotating
  User-Agent (dags/pull_new_sales_list.py:105-180)
"""

from __future__ import annotations

import urllib.parse
import urllib.request

TYPEAHEAD_URL = "https://www.rightmove.co.uk/typeAhead/uknostreet/"
SEARCH_URL = "https://www.rightmove.co.uk/property-for-sale/find.html"
USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)",
    "Mozilla/5.0 (X11; Linux x86_64)",
]


def _get(url: str, timeout: float, ua_index: int = 0) -> str | None:
    req = urllib.request.Request(
        url, headers={"User-Agent": USER_AGENTS[ua_index % len(USER_AGENTS)]}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status != 200:
                return None
            return resp.read().decode("utf-8", errors="replace")
    except Exception:
        return None  # per-key error isolation (caller emits sentinel/skips)


def typeahead_fetch(outcode: str) -> str | None:
    """S4 — typeahead JSON lookup for one outcode (10 s timeout)."""
    # the typeahead API chunks the query into 2-char path segments
    chunks = [outcode[i : i + 2] for i in range(0, len(outcode), 2)]
    url = TYPEAHEAD_URL + "/".join(chunks) + "/"
    return _get(url, timeout=10.0)


def search_page_fetch(area_id: int, offset: int) -> str | None:
    """S5 — one search-result page for an area (15 s timeout, business
    filters from dags/pull_new_sales_list.py:165-178)."""
    params = urllib.parse.urlencode(
        {
            "locationIdentifier": f"REGION^{area_id}",
            "index": offset,
            "maxDaysSinceAdded": 1,
            "dontShow": "newHome,retirement,sharedOwnership",
            "channel": "BUY",
        }
    )
    return _get(f"{SEARCH_URL}?{params}", timeout=15.0, ua_index=offset // 24)
