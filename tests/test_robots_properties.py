"""Property test: the JVM robots.txt fold vs an independent pure-Python
reference over randomized grammars — parser robustness evidence beyond
the hand-written RFC 9309 cases in test_web_ops.py."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


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
                    rules.append((allow, val))
    return rules


def ref_blocked(path: str, rules) -> bool:
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
            ["/", "/a", "/a/b", "/private/", "/*.pdf$", "/x*y", "", "/a$"]
        ),
    ),
    st.sampled_from(
        ["", "# a comment", "Sitemap: http://x/s.xml", "Crawl-delay: 3",
         "Disallow: /tail # trailing comment"]
    ),
)

PATH = st.sampled_from(
    ["/", "/a", "/a/b/c", "/private/x", "/doc.pdf", "/doc.pdfx",
     "/xzzy", "/x123y", "/a$"]
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
