"""URL canonicalization — the first dedup key of every web-crawl corpus.

Crawl curation (CCNet, RefinedWeb, C4) dedups by canonical URL before
any content hashing: the same page arrives as http/https, with/without
``www.``, with tracking parameters, fragments, and trailing-slash
variants. This module canonicalizes with pure Catalyst expressions (no
UDF — the hot path of a 100 TB crawl manifest must stay in codegen):

  * scheme and host lowercase, leading ``www.`` dropped;
  * fragment dropped;
  * query parameters: tracking params removed (``utm_*``, ``fbclid``,
    ``gclid``), the rest SORTED (param order is not identity) and
    rejoined;
  * path: case preserved (paths are case-sensitive), empty path becomes
    ``/``, trailing slash dropped except at the root.

Every step is also expressible in ANSI-ish SQL (regexp extraction +
list filter/sort), which is what makes q_url_canonical an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_[A-Za-z]*|fbclid|gclid)="


def url_host_expr(url: Column) -> Column:
    """Lowercased host[:port] with any leading www. dropped."""
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def canonical_url_expr(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = url_host_expr(url)
    raw_path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(raw_path) > 1) & raw_path.endswith("/"),
            F.substring(raw_path, F.lit(1), F.length(raw_path) - 1),
        ).otherwise(raw_path)
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    qpart = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), host, path, qpart)
