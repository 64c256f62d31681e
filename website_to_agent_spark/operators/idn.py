"""IDN (internationalized domain name) normalization — fetch
``http://bücher.example/`` the way a real client does: the wire form
of the host is its punycode ASCII-Compatible Encoding
(``xn--bcher-kva.example``, RFC 3490/3492), and a frontier that keeps
the unicode form and the ACE form as different strings fetches the
same site twice and splits its politeness/seen/link-graph state
across two host keys. The reference inherits this from requests
(which IDNA-encodes on connect) but its URL *bookkeeping* is string-
level, so the split-state bug exists there too — here the frontier
normalizes once, up front.

Scale shape — the kernel never sees the ASCII web: real corpora are
overwhelmingly ASCII-authority URLs, so ``normalize_idn`` splits on a
pure-column ASCII gate (``rlike`` — whole-stage codegen) and only the
non-ASCII sliver pays the Arrow batch (Python's stdlib ``idna`` codec
is the honest kernel: Spark has no punycode builtin). Map-only both
branches, zero shuffle; any malformed authority passes through
unchanged (frontier hygiene must never fail a task).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_ASCII_RE = r"^[\x00-\x7F]*$"
_AUTH_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*://)([^/?#]*)(.*)$",
                      re.DOTALL)


def _encode_host(host: str) -> str:
    # IPv6 literals and empty hosts pass through; the idna codec
    # case-folds and nameprep-validates per label (RFC 3490)
    if not host or host.startswith("["):
        return host
    labels = host.split(".")
    out = []
    for lab in labels:
        if lab == "" or lab.isascii():
            out.append(lab.lower())
        else:
            out.append(lab.encode("idna").decode("ascii"))
    return ".".join(out)


def _idna_one(url: str) -> str:
    m = _AUTH_RE.match(url)
    if not m:
        return url
    scheme, auth, rest = m.groups()
    userinfo, sep, hostport = auth.rpartition("@")
    host, colon, port = hostport.partition(":")
    try:
        host = _encode_host(host)
    except (UnicodeError, ValueError):
        return url
    return scheme + userinfo + sep + host + colon + port + rest


def idna_url(url: Column) -> Column:
    """Arrow-batched punycode normalization of a URL column's host
    (path/query/fragment untouched — percent-encoding of non-ASCII
    paths is a different, content-bearing transform). Prefer
    :func:`normalize_idn`, which gates the kernel off the ASCII
    majority."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _series(s):
        return s.map(lambda u: None if u is None else _idna_one(u))

    _series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_series, "string")(url)


def normalize_idn(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Rewrite ``url_col`` hosts to their IDNA ACE (punycode) form.
    The ASCII-authority majority takes a pass-through branch the plan
    keeps in whole-stage codegen (no Python, no shuffle); only rows
    containing any non-ASCII character reach the kernel. Run it on
    the frontier BEFORE the seen-set/politeness keys are derived."""
    is_ascii = F.col(url_col).isNull() | F.col(url_col).rlike(_ASCII_RE)
    passthrough = df.filter(is_ascii)
    encoded = df.filter(~is_ascii).withColumn(
        url_col, idna_url(F.col(url_col)))
    return passthrough.unionByName(encoded)
