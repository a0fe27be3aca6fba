"""Shared ``tokenizer.json`` section parsers: the SentencePiece
``Precompiled`` charsmap normalizer, normalizer-chain parsing/
composition (:func:`parse_norm_chain` / :func:`chain_fn`), and the
``post_processor`` special-token template (:func:`parse_post_processor`).

The centerpiece is the ``Precompiled`` charsmap every converted
T5/XLNet/ALBERT ``tokenizer.json`` carries.

The blob is the PUBLIC interchange format both HF ``tokenizers``
(normalizers/precompiled.rs via the ``spm_precompiled`` crate) and
SentencePiece itself read: a little-endian u32 byte-length, a
darts-clone double-array trie of u32 units keyed by the UTF-8 bytes of
each mapped sequence, then the concatenated NUL-terminated replacement
strings ("normalized" blob); a trie leaf's value is the byte offset of
its replacement. This module re-implements the reader and the
application algorithm from that public spec — no code is copied from
either project.

Application (the HF algorithm): iterate grapheme clusters; a cluster
under 6 UTF-8 bytes with a whole-cluster mapping is replaced as one
unit, otherwise each code point is looked up (and kept verbatim on a
miss). Grapheme clustering here is the base + combining-marks + CRLF
approximation: full UAX #29 needs property tables the stdlib lacks,
and the under-6-byte gate means the approximation can only diverge for
multi-code-point clusters that (a) fit in 5 bytes, (b) are NOT
base+combining, and (c) have a whole-cluster charsmap entry — decomposed
Hangul jamo pairs are the one practical family, called out in the
loader docstring and pinned against the real library by the
(offline-skipped) HF parity test.
"""

from __future__ import annotations

import struct

from ..exceptions import InvalidParameterError


def _graphemes(s: str):
    """base + combining-marks (+ CRLF) cluster approximation — see
    module docstring for the exact divergence envelope."""
    import unicodedata

    cluster = ""
    for ch in s:
        if cluster and (
            unicodedata.combining(ch)
            or (cluster[-1] == "\r" and ch == "\n")
        ):
            cluster += ch
        else:
            if cluster:
                yield cluster
            cluster = ch
    if cluster:
        yield cluster


class PrecompiledCharsmap:
    """Parse + apply one precompiled charsmap blob (driver/executor
    side, pure Python — model-sized, rides task closures)."""

    def __init__(self, blob: bytes):
        if len(blob) < 4:
            raise InvalidParameterError(
                "precompiled_charsmap blob is too short to carry its "
                "trie-size header — the tokenizer.json is corrupt"
            )
        (trie_size,) = struct.unpack("<I", blob[:4])
        if 4 + trie_size > len(blob) or trie_size % 4:
            raise InvalidParameterError(
                f"precompiled_charsmap declares a {trie_size}-byte trie "
                f"but the blob holds {len(blob) - 4} bytes after the "
                "header — the tokenizer.json is corrupt"
            )
        n = trie_size // 4
        self._trie = struct.unpack(f"<{n}I", blob[4:4 + trie_size])
        self._normalized = blob[4 + trie_size:]
        # chunk -> replacement (or None) memo: corpus text repeats a
        # bounded charset, so the trie walk runs once per DISTINCT
        # chunk instead of once per occurrence (capped so adversarial
        # grapheme diversity cannot grow it unbounded)
        self._memo: dict[str, str | None] = {}

    # darts-clone u32 unit accessors (public format)
    @staticmethod
    def _has_leaf(u: int) -> bool:
        return bool((u >> 8) & 1)

    @staticmethod
    def _value(u: int) -> int:
        return u & 0x7FFFFFFF

    @staticmethod
    def _label(u: int) -> int:
        return u & 0x800000FF

    @staticmethod
    def _offset(u: int) -> int:
        return (u >> 10) << ((u & 0x200) >> 6)

    def _common_prefix_search(self, key: bytes) -> list[int]:
        trie = self._trie
        results: list[int] = []
        unit = trie[0]
        pos = self._offset(unit)
        for c in key:
            pos ^= c
            if pos >= len(trie):
                return results
            unit = trie[pos]
            if self._label(unit) != c:
                return results
            pos ^= self._offset(unit)
            if self._has_leaf(unit):
                results.append(self._value(trie[pos]))
        return results

    def transform(self, chunk: str) -> str | None:
        """Replacement for ``chunk``, or None when unmapped — the
        FIRST trie hit indexes the NUL-terminated normalized blob."""
        # lazy init: robust to instances unpickled from a closure that
        # predates the memo attribute (executor-side re-import skew)
        memo = self.__dict__.setdefault("_memo", {})
        if chunk in memo:
            return memo[chunk]
        results = self._common_prefix_search(chunk.encode("utf-8"))
        if not results:
            out = None
        else:
            index = results[0]
            end = self._normalized.find(b"\x00", index)
            if end < 0:
                end = len(self._normalized)
            out = self._normalized[index:end].decode("utf-8", "replace")
        if len(memo) < 1 << 16:
            memo[chunk] = out
        return out

    def normalize(self, s: str) -> str:
        out: list[str] = []
        for g in _graphemes(s):
            if len(g.encode("utf-8")) < 6:
                norm = self.transform(g)
                if norm is not None:
                    out.append(norm)
                    continue
            for ch in g:
                norm = self.transform(ch)
                out.append(ch if norm is None else norm)
        return "".join(out)


def chain_fn(chain: list[dict]):
    """Compose an imported normalizer ATOM chain into one exact
    Python ``str -> str`` callable (executor-side, Arrow-batched by
    the caller). Atom shapes are validated at LOAD time — this
    builder trusts them."""
    import base64
    import re as _re
    import unicodedata

    steps = []
    for a in chain:
        t = a["type"]
        if t == "Precompiled":
            pc = PrecompiledCharsmap(
                base64.b64decode(a["precompiled_charsmap"])
            )
            steps.append(pc.normalize)
        elif t == "Replace":
            pat, content = a["pattern"], a.get("content", "")
            if "String" in pat:
                lit = pat["String"]
                steps.append(
                    lambda x, lit=lit, c=content: x.replace(lit, c)
                )
            else:
                rx = _re.compile(pat["Regex"])
                steps.append(lambda x, rx=rx, c=content: rx.sub(c, x))
        elif t == "Lowercase":
            steps.append(str.lower)
        elif t == "Strip":
            left = bool(a.get("strip_left", True))
            right = bool(a.get("strip_right", True))

            def strip(x, left=left, right=right):
                if left:
                    x = x.lstrip()
                if right:
                    x = x.rstrip()
                return x

            steps.append(strip)
        elif t in ("NFC", "NFD", "NFKC", "NFKD"):
            steps.append(
                lambda x, form=t: unicodedata.normalize(form, x)
            )
        else:  # pragma: no cover - load-time validation rejects these
            raise InvalidParameterError(
                f"unsupported normalizer atom {t!r}"
            )

    def f(s: str) -> str:
        for st in steps:
            s = st(s)
        return s

    return f


def parse_norm_chain(norm, path: str) -> tuple[bool, list[dict]]:
    """Parse a tokenizer.json ``normalizer`` section into
    ``(lowercase_flag, atom_chain)`` — the published Unigram-file
    shapes (T5: Sequence[Precompiled, Replace]; XLNet-style:
    Replace/NF*/Lowercase/Strip sequences; bare Precompiled), or fail
    loud. A solo Lowercase keeps the pure-JVM flag path (chain
    empty); anything else becomes an exact-Python atom chain. The
    Precompiled charsmap is parsed NOW so a corrupt blob rejects at
    load, not mid-corpus."""
    import base64

    from ..validation import ensure

    if norm is None:
        return False, []
    if norm == {"type": "Lowercase"}:
        return True, []
    atoms = (
        norm.get("normalizers")
        if isinstance(norm, dict) and norm.get("type") == "Sequence"
        else [norm]
        if isinstance(norm, dict)
        else None
    )
    ensure(
        atoms is not None,
        f"unsupported normalizer {norm!r} in '{path}'",
    )
    chain: list[dict] = []
    for a in atoms:
        t = a.get("type") if isinstance(a, dict) else None
        if t == "Precompiled":
            blob = a.get("precompiled_charsmap")
            ensure(
                isinstance(blob, str),
                f"Precompiled normalizer in '{path}' has no "
                "precompiled_charsmap string",
            )
            PrecompiledCharsmap(base64.b64decode(blob))  # fail-loud
            chain.append(
                {"type": "Precompiled", "precompiled_charsmap": blob}
            )
        elif t == "Replace":
            pat = a.get("pattern") or {}
            ensure(
                isinstance(pat, dict)
                and ("String" in pat or "Regex" in pat),
                f"Replace normalizer in '{path}' needs a String or "
                "Regex pattern",
            )
            chain.append(
                {
                    "type": "Replace",
                    "pattern": dict(pat),
                    "content": str(a.get("content", "")),
                }
            )
        elif t == "Lowercase":
            chain.append({"type": "Lowercase"})
        elif t == "Strip":
            chain.append(
                {
                    "type": "Strip",
                    "strip_left": bool(a.get("strip_left", True)),
                    "strip_right": bool(a.get("strip_right", True)),
                }
            )
        elif t in ("NFC", "NFD", "NFKC", "NFKD"):
            chain.append({"type": t})
        else:
            raise InvalidParameterError(
                f"unsupported normalizer atom {a!r} in '{path}': this "
                "engine reproduces Precompiled/Replace/Lowercase/"
                "Strip/NFC/NFD/NFKC/NFKD chains — silently skipping "
                "one would encode every document to wrong ids"
            )
    return False, chain


def parse_truncation(trunc, path: str) -> dict | None:
    """Parse a tokenizer.json ``truncation`` section into
    ``{'max_length', 'direction'}`` (None when the file carries none).
    HF applies a stored truncation on EVERY encode, so ignoring one
    would silently diverge — unsupported shapes reject loudly."""
    from ..validation import ensure

    if trunc is None:
        return None
    ensure(
        isinstance(trunc, dict) and int(trunc.get("max_length", 0)) > 0,
        f"unsupported truncation section {trunc!r} in '{path}'",
    )
    direction = str(trunc.get("direction", "Right"))
    ensure(
        direction in ("Right", "Left"),
        f"truncation direction {direction!r} in '{path}' is not "
        "reproduced (Right/Left only)",
    )
    # strategy LongestFirst/OnlyFirst/OnlySecond coincide for the
    # single-sequence document grain; stride only affects overflow
    # tokens, which corpus encode does not emit
    return {
        "max_length": int(trunc["max_length"]),
        "direction": direction,
    }


def truncate_seq_expr(seq, room: int, direction: str, elem: str):
    """Expression: keep ``room`` elements of ``seq`` from the Right
    (head) or Left (tail) — the HF truncation law at document grain.
    Short sequences pass through untouched."""
    from pyspark.sql import functions as F

    if room <= 0:
        return F.array().cast(f"array<{elem}>")
    if direction == "Left":
        kept = F.slice(seq, F.size(seq) - F.lit(room) + 1, room)
    else:
        kept = F.slice(seq, 1, room)
    return F.when(F.size(seq) <= room, seq).otherwise(kept)


def parse_post_processor(post) -> tuple[list[str], list[str], dict[str, int]] | None:
    """Parse a tokenizer.json ``post_processor`` into the
    single-sequence special-token template ``(prefix_tokens,
    suffix_tokens, token->id hints)`` — what HF's default
    ``encode(add_special_tokens=True)`` wraps every sequence with:

    - ``TemplateProcessing``: the ``single`` template's SpecialToken
      items before/after the ``Sequence A`` slot (pair templates are
      two-sequence surface, irrelevant at document grain).
    - ``RobertaProcessing`` / ``BertProcessing``: cls prefix + sep
      suffix (their fixed template).
    - ``ByteLevel`` (GPT-2/RoBERTa trim_offsets) and None: no specials.
    - A ``Sequence`` of processors: the union of its members' specials
      (published files chain ByteLevel + Roberta).

    Returns None when the shape is not recognized — the engine's
    DEFAULT encode semantics (``add_special_tokens=False``) never
    consults the template, so unknown processors only matter (and then
    fail loudly) if the caller opts in."""
    if post is None:
        return [], [], {}
    if not isinstance(post, dict):
        return None
    t = post.get("type")
    if t == "ByteLevel":
        return [], [], {}
    if t in ("RobertaProcessing", "BertProcessing"):
        cls_, sep = post.get("cls"), post.get("sep")
        if not (isinstance(cls_, (list, tuple)) and len(cls_) == 2
                and isinstance(sep, (list, tuple)) and len(sep) == 2):
            return None
        return (
            [str(cls_[0])],
            [str(sep[0])],
            {str(cls_[0]): int(cls_[1]), str(sep[0]): int(sep[1])},
        )
    if t == "Sequence":
        pre: list[str] = []
        suf: list[str] = []
        hints: dict[str, int] = {}
        for sub in post.get("processors") or []:
            parsed = parse_post_processor(sub)
            if parsed is None:
                return None
            p, s, h = parsed
            pre += p
            suf += s
            hints.update(h)
        return pre, suf, hints
    if t != "TemplateProcessing":
        return None
    single = post.get("single") or []
    pre, suf = [], []
    seen_seq = False
    for item in single:
        if not isinstance(item, dict):
            return None
        if "Sequence" in item:
            if (item["Sequence"] or {}).get("id") not in (None, "A"):
                return None
            if seen_seq:
                return None
            seen_seq = True
        elif "SpecialToken" in item:
            tok = (item["SpecialToken"] or {}).get("id")
            if tok is None:
                return None
            (suf if seen_seq else pre).append(str(tok))
        else:
            return None
    if not seen_seq:
        return None
    hints = {}
    spec_map = post.get("special_tokens")
    if isinstance(spec_map, dict):  # the serialized form is a map
        for tok, spec in spec_map.items():
            ids = (spec or {}).get("ids") or []
            toks = (spec or {}).get("tokens") or []
            if len(ids) == 1 and len(toks) == 1:
                hints[str(toks[0])] = int(ids[0])
    return pre, suf, hints


def build_charsmap_blob(mapping: dict[str, str]) -> bytes:
    """Serialize a charsmap blob for the reader above — a minimal
    darts double-array builder (test/fixture path; real blobs come
    from published tokenizer.json files). Keys must be non-empty and
    NUL-free."""
    items = sorted(mapping.items())
    for k in mapping:
        if not k or "\x00" in k:
            raise InvalidParameterError(
                "charsmap keys must be non-empty and NUL-free"
            )
    normalized = bytearray()
    offsets: dict[str, int] = {}
    for _, v in items:
        if v not in offsets:
            offsets[v] = len(normalized)
            normalized += v.encode("utf-8") + b"\x00"

    # trie over the keys' UTF-8 bytes
    class Node:
        def __init__(self):
            self.children: dict[int, "Node"] = {}
            self.value: int | None = None

    root = Node()
    for k, v in items:
        node = root
        for b in k.encode("utf-8"):
            node = node.children.setdefault(b, Node())
        node.value = offsets[v]

    units: dict[int, int] = {}
    used_bases: set[int] = set()

    def occupied(pos: int) -> bool:
        return pos in units

    def place(node: Node, slot: int, unit_label: int) -> None:
        """Assign node's base, write its unit at ``slot`` (label
        already known), recurse."""
        labels = sorted(node.children)
        # choose a base so that base (value slot, if leaf) and
        # base^label slots are all free. Bases must also be UNIQUE
        # across nodes (the double-array invariant): two nodes
        # sharing a base would alias each other's children — a byte
        # valid under the sibling would traverse into ITS child with
        # a matching label and return a spurious hit.
        base = 1
        while True:
            need = [base ^ c for c in labels]
            if node.value is not None:
                need.append(base)
            if (
                base not in used_bases
                and all(not occupied(p) for p in need)
                and all(p != slot for p in need)
            ):
                break
            base += 1
        used_bases.add(base)
        # the offset FIELD is relative: the reader computes the node's
        # base as slot ^ offset (darts-clone traversal contract)
        unit = ((base ^ slot) << 10) | unit_label
        if node.value is not None:
            unit |= 1 << 8
            units[base] = node.value | (1 << 31)
        units[slot] = unit
        for c in labels:
            # reserve the child's slot before recursing so sibling
            # bases cannot steal it
            units[base ^ c] = c
        for c in labels:
            place(node.children[c], base ^ c, c)

    # root unit: label field unused by the reader, offset = root base
    place(root, 0, 0)
    size = max(units) + 1
    arr = [0] * size
    for pos, u in units.items():
        arr[pos] = u
    trie = struct.pack(f"<{size}I", *arr)
    return struct.pack("<I", len(trie)) + trie + bytes(normalized)
