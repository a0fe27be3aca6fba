"""Property test: the JVM robots.txt fold vs an independent pure-Python
reference over randomized grammars — parser robustness evidence beyond
the hand-written RFC 9309 cases in test_web_ops.py."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def ref_pct_norm(s: str) -> str:
    """Independent RFC 3986 §6.2.2 normalization: uppercase %XX,
    decode unreserved-only (mirrors pct_normalize_expr by spec, not by
    construction)."""
    parts = s.split("%")
    out = [parts[0]]
    for p in parts[1:]:
        h = p[:2]
        if re.fullmatch("[0-9A-Fa-f]{2}", h or ""):
            c = chr(int(h, 16))
            if re.fullmatch("[A-Za-z0-9._~-]", c):
                out.append(c + p[2:])
            else:
                out.append("%" + h.upper() + p[2:])
        else:
            out.append("%" + p)
    return "".join(out)


def ref_rules(txt: str, agent: str = "*"):
    """Independent reference: same RFC 9309 subset, written as a plain
    line loop (not a port of the fold)."""
    rules = []
    applies = False
    last_ua = False
    for raw in (txt or "").split("\n"):
        ln = raw.split("#", 1)[0].strip().rstrip("\r")
        low = ln.lower()
        if low.startswith("user-agent:"):
            ua = ln.split(":", 1)[1].strip().lower()
            match = ua in ("*", agent.lower())
            applies = (applies or match) if last_ua else match
            last_ua = True
            continue
        last_ua = False
        for field, allow in (("disallow:", False), ("allow:", True)):
            if low.startswith(field):
                val = ln.split(":", 1)[1].strip()
                if applies and val:
                    rules.append((allow, ref_pct_norm(val)))
    return rules


def ref_blocked(path: str, rules) -> bool:
    path = ref_pct_norm(path or "/")
    best_len, blocked = -1, False
    for allow, prefix in rules:
        pat = "^" + re.escape(prefix).replace(r"\*", ".*")
        if pat.endswith(r"\$"):
            pat = pat[:-2] + "$"
        if re.match(pat, path or "/"):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow and blocked):
                best_len, blocked = plen, not allow
    return blocked


LINE = st.one_of(
    st.builds(
        lambda ua: f"User-agent: {ua}",
        st.sampled_from(["*", "gptbot", "otherbot", "SomeBot"]),
    ),
    st.builds(
        lambda allow, p: f"{'Allow' if allow else 'Disallow'}: {p}",
        st.booleans(),
        st.sampled_from(
            ["/", "/a", "/a/b", "/private/", "/*.pdf$", "/x*y", "", "/a$",
             "/%7euser/", "/%7Euser/pub", "/a%2Fb", "/caf%c3%a9/",
             "/%zz", "/100%"]
        ),
    ),
    st.sampled_from(
        ["", "# a comment", "Sitemap: http://x/s.xml", "Crawl-delay: 3",
         "Disallow: /tail # trailing comment"]
    ),
)

PATH = st.sampled_from(
    ["/", "/a", "/a/b/c", "/private/x", "/doc.pdf", "/doc.pdfx",
     "/xzzy", "/x123y", "/a$", "/~user/x", "/%7Euser/pub/y", "/a%2fb",
     "/caf%C3%A9/x", "/%zz", "/100%"]
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=st.lists(LINE, min_size=0, max_size=12),
    paths=st.lists(PATH, min_size=1, max_size=4, unique=True),
    agent=st.sampled_from(["*", "gptbot"]),
)
def test_robots_fold_matches_reference(spark, lines, paths, agent):
    from feature_factory_spark.operators.web import (
        robots_blocked_expr, robots_rules_expr,
    )

    txt = "\n".join(lines)
    rows = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).select(
        "path",
        robots_blocked_expr(
            F.col("path"), robots_rules_expr(F.lit(txt), agent)
        ).alias("blocked"),
    ).collect()
    rules = ref_rules(txt, agent)
    for r in rows:
        assert r["blocked"] == ref_blocked(r["path"], rules), (
            txt, r["path"], rules
        )


PCT_STR = st.text(
    alphabet="abAB019%/~._-$*zF", min_size=0, max_size=24
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(paths=st.lists(PCT_STR, min_size=1, max_size=8, unique=True))
def test_pct_normalize_matches_reference_and_is_idempotent(spark, paths):
    from feature_factory_spark.operators.web import pct_normalize_expr

    rows = spark.createDataFrame(
        [(p,) for p in paths], "s string"
    ).select(
        "s",
        pct_normalize_expr(F.col("s")).alias("once"),
        pct_normalize_expr(
            pct_normalize_expr(F.col("s"))
        ).alias("twice"),
    ).collect()
    for r in rows:
        # matches the independent Python reference
        assert r["once"] == ref_pct_norm(r["s"]), r["s"]
        # RFC 3986 §6.2.2 normalization is idempotent
        assert r["twice"] == r["once"], r["s"]
