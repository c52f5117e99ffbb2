"""Minimal DOM + CSS-selector + XPath engine for the parse stage (P3-P9).

The reference dispatches OnHTML callbacks through goquery's full CSS engine
(colly.go:1219-1237) and OnXML through htmlquery/xmlquery XPath
(colly.go:1241-1317). This container has neither lxml nor selectolax, so the
engine builds one ``xml.etree.ElementTree`` tree per document (lenient HTML
parse via the stdlib ``html.parser``, strict XML via ``ET.fromstring``) and
evaluates both selector languages over it:

- CSS subset: tag, ``*``, ``.class``, ``#id``, ``[attr]``, ``[attr=val]``,
  ``[attr~=val]``, ``[attr^=]``/``[attr$=]``/``[attr*=]``/``[attr|=]``, the
  structural pseudo-classes ``:first-child``/``:last-child``/
  ``:nth-child(an+b)``/``:nth-last-child(an+b)`` (including the
  ``an+b of S`` filtered form), the of-type family
  (``:first-of-type``/``:last-of-type``/``:nth-of-type``/
  ``:nth-last-of-type``), ``:only-child``/``:only-of-type``, ``:empty``,
  ``:not(compound, ...)``, ``:is(compound, ...)``/``:where(...)``
  (match-any grouping; identical here since a match-only engine has no
  specificity), the element-state pseudos ``:root``/``:checked``/
  ``:disabled``/``:enabled``/``:link``, and cascadia's jQuery-extension pseudos
  ``:contains("text")`` (case-insensitive substring over text content) and
  ``:has(selector)`` (descendant exists — subtree-scoped), compounds
  (``a.cls[href]:first-child``), descendant
  (space), child (``>``), adjacent-sibling (``+``) and general-sibling
  (``~``) combinators, and selector groups (``,``). Any other pseudo-class
  raises ``CssSelectorError`` (loud reject — silent non-matching would
  hide selector typos). Matching backtracks over candidate
  ancestors/siblings (a chain like ``x > y z`` matches via an OUTER y when
  the nearest y's parent is not x — same as real CSS engines). Matches are
  returned in document order, which is what gives HTMLElement.Index its
  meaning (htmlelement.go:38).
- XPath subset: absolute (``/html/body/p``) and anywhere (``//page/title``)
  paths, ``*``, ``[@attr]``/``[@attr='v']``/``[tag]`` predicates, and the
  positional predicates ``[n]``/``[last()]``/``[last()-n]`` (ElementPath
  evaluates them per parent — every element in the given position relative
  to ITS parent — which is exactly XPath 1.0's semantics for an unaxised
  step) — the forms colly's own tests exercise (colly_test.go:1573-1631)
  — delegated to ElementTree's ElementPath after a small translation.
  On top of ElementPath, a stepwise evaluator handles ``contains()`` /
  ``starts-with()`` / ``[text()='v']`` / ``[.='v']`` / ``not(pred)`` /
  ``normalize-space(subject)`` (as a subject of contains/starts-with/=) /
  ``position() OP n`` / ``last()-n`` predicates in ANY step
  (``//a[contains(@href,'x')]/span``), quote-aware (brackets and slashes
  inside string literals are content), and the full
  XPath 1.0 element-axis set — ``parent::``/``..``/``self::``,
  ``following-sibling::``/``preceding-sibling::``,
  ``ancestor(-or-self)::``/``descendant(-or-self)::``,
  ``following::``/``preceding::`` — with simple predicates (positional
  indexes count along the axis direction, nearest-first on reverse axes).
  Number comparisons follow XPath 1.0 number() semantics in any step —
  ``[@a OP n]`` / ``[text() OP n]`` / ``[child OP n]`` (node-set: ANY
  matching child) for all six ops, plus ``count(child-test)`` and
  ``string-length(subject)`` subjects and string ``!=``. String functions
  ``substring(subj, start[, len])`` (XPath rounding), ``translate(subj,
  from, to)``, ``substring-before``/``substring-after`` compose as
  subjects of ``=``/``!=``/``contains``/``starts-with``/numeric
  comparisons, and ``mod`` works both as ``position() mod N OP K`` and on
  any numeric subject (dividend-sign semantics). Predicate bodies beyond
  these pinned forms fall back to a recursive-descent evaluator of XPath
  1.0 expressions — ``or``/``and``, ``+ - * div mod`` arithmetic with
  IEEE semantics, comparisons between computed values (``[position() <
  last()]``), ``concat()``/``boolean()``/``number()``/``string()``/
  ``true()``/``false()``/``name()`` with nesting, relative location
  paths as operands (``[a/b = 'v']``, ``[.//img]``, ``count(info//sku)``,
  ``contains(a/@href, 'x')``) with node-sets comparing existentially —
  and top-level ``|`` unions merge in document order. The remaining
  XPath 1.0 surface (attribute/namespace axes as mid-path steps, named
  axes inside predicates, variables) raises ValueError (loud reject,
  documented divergence from xmlquery's full XPath 1.0,
  /root/reference/xmlelement.go:26-42).

Everything here is pure Python over one in-memory tree per document; the
Spark side calls it from an Arrow-batched pandas UDF (one parse per page,
SURVEY.md §2 P3), never per-row from the driver.
"""

from __future__ import annotations

import functools
import math
import re
import xml.etree.ElementTree as ET
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tags whose open implicitly closes a same-or-listed open tag (tiny subset of
# the HTML5 tree-construction rules; enough for test/fixture markup)
IMPLICIT_CLOSERS = {
    "li": ("li",),
    "p": ("p",),
    "option": ("option",),
    "tr": ("tr", "td", "th"),
    "td": ("td", "th"),
    "th": ("td", "th"),
}


class _TreeBuilder(HTMLParser):
    """Lenient HTML -> ElementTree: unclosed/mismatched tags never raise."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = ET.Element("__root__")
        self.stack = [self.root]
        self._last: ET.Element | None = None  # for tail text

    def _open(self, tag: str, attrs) -> ET.Element:
        closers = IMPLICIT_CLOSERS.get(tag)
        if closers and len(self.stack) > 1 and self.stack[-1].tag in closers:
            self.stack.pop()
        el = ET.SubElement(self.stack[-1], tag, dict((k, v or "") for k, v in attrs))
        return el

    def handle_starttag(self, tag, attrs):
        el = self._open(tag, attrs)
        if tag in VOID_ELEMENTS:
            self._last = el
        else:
            self.stack.append(el)
            self._last = None

    def handle_startendtag(self, tag, attrs):
        self._last = self._open(tag, attrs)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                self._last = self.stack[i]
                del self.stack[i:]
                return
        # stray end tag: ignored (goquery/net-html are equally forgiving)

    def handle_data(self, data):
        if not data:
            return
        if self._last is not None and self._last is not self.stack[-1]:
            self._last.tail = (self._last.tail or "") + data
        else:
            cur = self.stack[-1]
            if len(cur):
                last_child = cur[-1]
                last_child.tail = (last_child.tail or "") + data
            else:
                cur.text = (cur.text or "") + data


def parse_html(text: str) -> ET.Element:
    """Parse (possibly malformed) HTML into a tree rooted at ``__root__``."""
    b = _TreeBuilder()
    b.feed(text)
    b.close()
    return b.root


def parse_xml(text: str) -> ET.Element | None:
    """Strict XML parse wrapped under the same ``__root__`` wrapper; returns
    None on malformed input (colly's xmlquery would error the callback)."""
    try:
        el = ET.fromstring(text)
    except ET.ParseError:
        return None
    root = ET.Element("__root__")
    root.append(el)
    return root


def text_content(el: ET.Element) -> str:
    """All descendant text, like goquery Selection.Text()."""
    return "".join(el.itertext())


# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*|\*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w-]+)\s*(?:(?P<op>[~^$*|]?=)\s*(?P<q>["']?)(?P<val>[^\]"']*)(?P=q)\s*)?\]
  | :(?P<pseudo>[\w-]+)(?:\((?P<parg>[^()]*(?:\([^()]*\)[^()]*)*)\))?
    """,
    re.VERBOSE,
)

_NTH_AB = re.compile(r"^([+-]?\d*)n\s*([+-]\s*\d+)?$")


class CssSelectorError(ValueError):
    pass


def _parse_nth(arg: str) -> tuple[int, int]:
    """':nth-child()' argument -> (a, b) of the an+b form."""
    s = (arg or "").strip().lower()
    if s == "odd":
        return 2, 1
    if s == "even":
        return 2, 0
    if re.fullmatch(r"[+-]?\d+", s):
        return 0, int(s)
    m = _NTH_AB.fullmatch(s)
    if m:
        a_s = m.group(1)
        a = 1 if a_s in ("", "+") else (-1 if a_s == "-" else int(a_s))
        b = int(m.group(2).replace(" ", "")) if m.group(2) else 0
        return a, b
    raise CssSelectorError(f"unsupported :nth-child() argument {arg!r}")


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside brackets/parens/quotes — ',' inside
    ``:is(a, b)`` or ``:contains("x,y")`` is content, not a group break.
    Pieces are stripped; empties are kept (callers reject them loudly)."""
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    quote = ""
    for ch in s:
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "\"'":
            quote = ch
        elif ch in "[(":
            depth += 1
        elif ch in "])":
            depth = max(0, depth - 1)
        elif ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    out.append("".join(buf).strip())
    return out


def _compile_compound(s: str) -> list[tuple]:
    """One compound selector ('a.cls[href]:first-child') -> simple tests."""
    tests: list[tuple] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            raise CssSelectorError(f"unsupported CSS selector syntax at {s[pos:]!r}")
        if m.group("tag"):
            tests.append(("tag", m.group("tag").lower()))
        elif m.group("cls"):
            tests.append(("class", m.group("cls")))
        elif m.group("id"):
            tests.append(("id", m.group("id")))
        elif m.group("pseudo"):
            # structural pseudo-classes (goquery evaluates full CSS3,
            # colly.go:1219-1237); everything else stays a LOUD reject —
            # silently matching nothing would hide selector typos
            name, parg = m.group("pseudo").lower(), m.group("parg")
            if name == "first-child":
                tests.append(("nth", 0, 1))
            elif name == "last-child":
                tests.append(("last",))
            elif name in ("nth-child", "nth-last-child"):
                arg = (parg or "").strip()
                last = name == "nth-last-child"
                mof = re.match(r"(?is)^(.+?)\s+of\s+(.+)$", arg)
                if mof:
                    # ':nth-child(An+B of S)': the An+B-th among siblings
                    # MATCHING S (and the element itself must match S)
                    a, b = _parse_nth(mof.group(1).strip())
                    alts = _split_top_level(mof.group(2), ",")
                    if not all(alts):
                        raise CssSelectorError(f"empty 'of' selector in {s!r}")
                    tests.append(
                        ("nth_of", a, b, last,
                         [_compile_compound(x) for x in alts])
                    )
                elif last:
                    a, b = _parse_nth(arg)
                    tests.append(("nth_last", a, b))
                else:
                    a, b = _parse_nth(arg)
                    tests.append(("nth", a, b))
            elif name == "first-of-type":
                tests.append(("nth_type", 0, 1))
            elif name == "last-of-type":
                tests.append(("last_type",))
            elif name == "nth-of-type":
                a, b = _parse_nth(parg or "")
                tests.append(("nth_type", a, b))
            elif name == "nth-last-of-type":
                a, b = _parse_nth(parg or "")
                tests.append(("nth_last_type", a, b))
            elif name == "only-child":
                tests.append(("only",))
            elif name == "only-of-type":
                tests.append(("only_type",))
            elif name == "empty":
                tests.append(("empty",))
            elif name in ("root", "checked", "disabled", "enabled", "link"):
                # cascadia's element-state pseudos (selector.go): :root
                # (document element), :checked (checked checkbox/radio or
                # selected option), :disabled/:enabled (form controls by
                # the disabled attribute), :link (a/area/link with href)
                tests.append((name,))
            elif name == "contains":
                # cascadia's jQuery-extension :contains("text"): substring
                # over the element's full text content, both sides
                # lowercased (selector.go textSubstrSelector)
                v = (parg or "").strip()
                if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
                    v = v[1:-1]
                tests.append(("text_contains", v.lower()))
            elif name == "has":
                # cascadia's :has(selector): any DESCENDANT matches the
                # inner selector group (evaluated scoped to the subtree)
                if not (parg or "").strip():
                    raise CssSelectorError(f"empty :has() in {s!r}")
                tests.append(("has", compile_css(parg.strip())))
            elif name == "not":
                # CSS4-style selector LIST argument (cascadia accepts the
                # grouping form): matches when NO alternative matches
                alts = _split_top_level(parg or "", ",")
                if not all(alts):
                    raise CssSelectorError(f"empty :not() in {s!r}")
                tests.append(("not", [_compile_compound(a) for a in alts]))
            elif name in ("is", "where"):
                # :is()/:where() — matches when ANY alternative compound
                # matches (identical here: specificity has no meaning in a
                # match-only engine)
                alts = _split_top_level(parg or "", ",")
                if not all(alts):
                    raise CssSelectorError(f"empty :{name}() in {s!r}")
                tests.append(("is", [_compile_compound(a) for a in alts]))
            else:
                raise CssSelectorError(f"unsupported pseudo-class :{name} in {s!r}")
        else:
            tests.append(("attr", m.group("attr"), m.group("op"), m.group("val")))
        pos = m.end()
    if not tests:
        raise CssSelectorError(f"empty compound in selector {s!r}")
    return tests


def compile_css(selector: str) -> list[list[tuple]]:
    """Selector group -> list of chains; chain = [(combinator, compound)...]
    where a compound's combinator relates it to the compound on its LEFT:
    '' (leftmost), ' ' (descendant), '>' (child), '+' (adjacent sibling),
    '~' (general sibling)."""
    chains = []
    for alt in _split_top_level(selector, ","):
        if not alt:
            raise CssSelectorError(f"empty alternative in {selector!r}")
        # bracket/paren-aware tokenization: '~' and whitespace inside
        # [attr~=v], and '+' inside :nth-child(n+4), are part of the
        # compound, not combinators
        parts: list[str] = []
        buf: list[str] = []
        depth = 0
        for ch in alt:
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth = max(0, depth - 1)
            if depth == 0 and ch in " \t>+~":
                if buf:
                    parts.append("".join(buf))
                    buf = []
                if ch in ">+~":
                    parts.append(ch)
                continue
            buf.append(ch)
        if buf:
            parts.append("".join(buf))
        seq: list[tuple] = []  # (combinator_to_previous, compound_tests)
        comb = ""
        pending = False  # a combinator token awaiting its right-hand compound
        for p in parts:
            if p in (">", "+", "~"):
                if pending or not seq:
                    raise CssSelectorError(f"dangling combinator in {alt!r}")
                comb = p
                pending = True
                continue
            seq.append((comb, _compile_compound(p)))
            comb = " "
            pending = False
        if not seq or pending:
            raise CssSelectorError(f"cannot parse selector {alt!r}")
        chains.append(seq)
    return chains


def _nth_ok(a: int, b: int, pos1: int) -> bool:
    """True iff 1-based ``pos1`` == a*k + b for some integer k >= 0."""
    if a == 0:
        return pos1 == b
    return (pos1 - b) * a >= 0 and (pos1 - b) % a == 0


def _matches_compound(el: ET.Element, tests: list[tuple], ctx: tuple) -> bool:
    """``ctx`` = (container, sib_idx) maps from css_select's structural pass
    — the positional pseudo-classes need the element's place among its
    ELEMENT siblings (ElementTree containers hold only elements, which is
    exactly what :nth-child counts)."""
    container, sib_idx = ctx
    for t in tests:
        if t[0] == "tag":
            if t[1] != "*" and el.tag.lower() != t[1]:
                return False
        elif t[0] == "class":
            if t[1] not in (el.get("class") or "").split():
                return False
        elif t[0] == "id":
            if el.get("id") != t[1]:
                return False
        elif t[0] == "nth":
            if not _nth_ok(t[1], t[2], sib_idx.get(id(el), 0) + 1):
                return False
        elif t[0] == "nth_last":
            cont = container.get(id(el))
            if cont is None or not _nth_ok(
                t[1], t[2], len(cont) - sib_idx.get(id(el), 0)
            ):
                return False
        elif t[0] == "last":
            cont = container.get(id(el))
            if cont is None or sib_idx.get(id(el), 0) != len(cont) - 1:
                return False
        elif t[0] == "only":
            cont = container.get(id(el))
            if cont is None or len(cont) != 1:
                return False
        elif t[0] in ("nth_type", "nth_last_type", "last_type", "only_type"):
            # position among same-TAG element siblings (CSS "type")
            cont = container.get(id(el))
            if cont is None:
                return False
            same = [c for c in cont if c.tag == el.tag]
            pos1 = next(i for i, c in enumerate(same, 1) if c is el)
            if t[0] == "nth_type":
                if not _nth_ok(t[1], t[2], pos1):
                    return False
            elif t[0] == "nth_last_type":
                if not _nth_ok(t[1], t[2], len(same) - pos1 + 1):
                    return False
            elif t[0] == "last_type":
                if pos1 != len(same):
                    return False
            elif len(same) != 1:  # only_type
                return False
        elif t[0] == "empty":
            # cascadia semantics: no element children, no non-whitespace
            # direct text (whitespace-only text nodes don't count)
            if len(el) > 0 or (el.text or "").strip():
                return False
        elif t[0] == "root":
            cont = container.get(id(el))
            if cont is None or cont.tag != "__root__":
                return False
        elif t[0] == "checked":
            tag = el.tag.lower()
            checked = (
                tag == "input"
                and (el.get("type") or "").lower() in ("checkbox", "radio")
                and el.get("checked") is not None
            ) or (tag == "option" and el.get("selected") is not None)
            if not checked:
                return False
        elif t[0] in ("disabled", "enabled"):
            formish = el.tag.lower() in (
                "button", "input", "select", "textarea",
                "option", "optgroup", "fieldset",
            )
            disabled = formish and el.get("disabled") is not None
            if t[0] == "disabled" and not disabled:
                return False
            if t[0] == "enabled" and not (formish and not disabled):
                return False
        elif t[0] == "link":
            if el.tag.lower() not in ("a", "area", "link") or el.get("href") is None:
                return False
        elif t[0] == "text_contains":
            if t[1] not in text_content(el).lower():
                return False
        elif t[0] == "has":
            if not css_select(el, t[1]):
                return False
        elif t[0] == "not":
            if any(_matches_compound(el, c, ctx) for c in t[1]):
                return False
        elif t[0] == "is":
            if not any(_matches_compound(el, c, ctx) for c in t[1]):
                return False
        elif t[0] == "nth_of":
            _, a, b, last, alts = t
            cont = container.get(id(el))
            if cont is None:
                return False
            matching = [
                c for c in cont
                if any(_matches_compound(c, cc, ctx) for cc in alts)
            ]
            pos1 = next(
                (i for i, c in enumerate(matching, 1) if c is el), None
            )
            if pos1 is None:  # the element itself must match S
                return False
            if last:
                pos1 = len(matching) - pos1 + 1
            if not _nth_ok(a, b, pos1):
                return False
        else:
            _, name, op, val = t
            got = el.get(name)
            if got is None:
                return False
            if op is None:
                continue
            if op == "=" and got != val:
                return False
            if op == "~=" and val not in got.split():
                return False
            if op == "^=" and not got.startswith(val):
                return False
            if op == "$=" and not got.endswith(val):
                return False
            if op == "*=" and val not in got:
                return False
            if op == "|=" and got != val and not got.startswith(val + "-"):
                return False
    return True


def css_select(root: ET.Element, selector: str | list) -> list[ET.Element]:
    """All elements under ``root`` matching the selector group, in document
    order, deduped across alternatives (goquery semantics).

    Matching is a right-to-left BACKTRACKING walk: when a descendant (' ')
    or general-sibling ('~') step has several candidates, every one is
    tried recursively — a greedy nearest-candidate commit would falsely
    reject e.g. ``x > y z`` when the nearest ``y`` ancestor's parent is not
    ``x`` but an outer ``y``'s is. Memoized on (element, chain position)."""
    chains = compile_css(selector) if isinstance(selector, str) else selector
    # one structural pass: document order, parent links (wrapper excluded
    # from ancestry), and container+index for sibling steps
    order: list[ET.Element] = []
    parent: dict[int, ET.Element | None] = {}
    container: dict[int, ET.Element] = {}
    sib_idx: dict[int, int] = {}

    def prep(el: ET.Element) -> None:
        is_wrapper = el.tag == "__root__"
        for i, child in enumerate(el):
            order.append(child)
            parent[id(child)] = None if is_wrapper else el
            container[id(child)] = el
            sib_idx[id(child)] = i
            prep(child)

    prep(root)

    out: list[ET.Element] = []
    taken: set[int] = set()
    ctx = (container, sib_idx)
    for seq in chains:
        memo: dict[tuple[int, int], bool] = {}

        def match_up(el: ET.Element, pos: int) -> bool:
            key = (id(el), pos)
            got = memo.get(key)
            if got is not None:
                return got
            ok = _match_up_raw(el, pos)
            memo[key] = ok
            return ok

        def _match_up_raw(el: ET.Element, pos: int) -> bool:
            if not _matches_compound(el, seq[pos][1], ctx):
                return False
            if pos == 0:
                return True
            comb = seq[pos][0]  # relates seq[pos] to seq[pos-1] on its left
            if comb == ">":
                par = parent.get(id(el))
                return par is not None and match_up(par, pos - 1)
            if comb == " ":
                par = parent.get(id(el))
                while par is not None:
                    if match_up(par, pos - 1):
                        return True
                    par = parent.get(id(par))
                return False
            cont, i = container.get(id(el)), sib_idx.get(id(el), 0)
            if cont is None:
                return False
            if comb == "+":
                return i > 0 and match_up(cont[i - 1], pos - 1)
            # '~': any preceding sibling
            return any(match_up(cont[j], pos - 1) for j in range(i - 1, -1, -1))

        for el in order:
            if id(el) not in taken and match_up(el, len(seq) - 1):
                taken.add(id(el))
                out.append(el)
    if len(chains) > 1:
        pos_of = {id(el): i for i, el in enumerate(order)}
        out.sort(key=lambda el: pos_of[id(el)])
    return out


# ---------------------------------------------------------------------------
# XPath subset (translated to ElementTree's ElementPath)
# ---------------------------------------------------------------------------


_XP_ATTR_TAIL = re.compile(r"/@([\w:-]+)$")
# a predicate "subject" — the node/string a test applies to: @attr, text(),
# '.', a child tag, or normalize-space() of any of those (bare
# normalize-space() means normalize-space(string(.)), per XPath 1.0)
# string-function subjects — substring()/translate()/substring-before()/
# substring-after() over a base subject; args may hold quoted text with
# any characters, plus text()/normalize-space()/ONE nested string-function
# call (deeper nesting stays loud-rejected)
_XP_STRFN_NAMES = r"(?:substring-before|substring-after|substring|translate)"
_XP_STRFN_ATOM = r"(?:[^()'\"]|'[^']*'|\"[^\"]*\")"
_XP_STRFN = (
    _XP_STRFN_NAMES + r"\((?:" + _XP_STRFN_ATOM
    + r"|text\(\)"
    + r"|normalize-space\(" + _XP_STRFN_ATOM + r"*\)"
    + r"|" + _XP_STRFN_NAMES + r"\(" + _XP_STRFN_ATOM + r"*\)"
    + r")*\)"
)
_XP_SUBJECT = (
    r"(@[\w:-]+|text\(\)|\.|[\w:-]+"
    r"|normalize-space\(\s*(?:@[\w:-]+|text\(\)|\.)?\s*\)"
    r"|" + _XP_STRFN + r")"
)
_XP_FUNC_PRED = re.compile(
    # the literal may not contain its own quote kind ((?!\3). tempered dot)
    # — '.*?' would let [contains(., "a") or contains(., "b")] swallow the
    # ' or ' into one bogus needle instead of reaching the expression
    # fallback
    r"^(contains|starts-with)"
    r"\(" + _XP_SUBJECT + r"\s*,\s*(['\"])((?:(?!\3).)*)\3\)$"
)
_XP_TEXT_EQ_PRED = re.compile(
    r"^" + _XP_SUBJECT + r"\s*=\s*(['\"])((?:(?!\2).)*)\2$"
)
_XP_AXIS_STEP = re.compile(
    r"^(following-sibling|preceding-sibling|following|preceding|parent"
    r"|ancestor-or-self|ancestor|descendant-or-self|descendant|self)"
    r"::(\*|[\w:-]+)(.*)$"
)
_XP_POSITION_PRED = re.compile(
    r"^position\(\)(?:\s*mod\s*(\d+))?\s*(!=|<=|>=|=|<|>)\s*(\d+)$"
)
_XP_LAST_MINUS = re.compile(r"^last\(\)\s*-\s*(\d+)$")
# tokens ElementPath cannot evaluate — route the path to the stepwise
# evaluator when any appears
_XP_STEPWISE_TOKENS = (
    "contains(", "starts-with(", "not(", "position()", "normalize-space(",
    "count(", "string-length(", "!=", "substring(", "translate(",
    "substring-before(", "substring-after(",
    # expression-fallback forms (boolean/arithmetic/general functions);
    # ' or '/' and '/' div ' need surrounding whitespace as XPath names
    # can't contain spaces — a quoted literal containing them routes to
    # the stepwise evaluator harmlessly (it evaluates those forms too)
    " or ", " and ", " div ", "concat(", "boolean(", "number(", "string(",
    "true(", "false(", "name(",
)
# XPath 1.0 number comparison: SUBJECT OP NUMBER with an UNQUOTED numeric
# right side; subjects additionally allow count()/string-length()
_XP_NUM_PRED = re.compile(r"^(.+?)\s*(!=|<=|>=|=|<|>)\s*(-?\d+(?:\.\d+)?)$")
_XP_NUM_OPS = {
    "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
}


def _xp_needs_stepwise(s: str) -> bool:
    return (
        any(t in s for t in _XP_STEPWISE_TOKENS)
        or re.search(r"\[(?:text\(\)|\.)\s*=", s) is not None
        # numeric comparisons: '<'/'>' anywhere in a predicate, or '='
        # against an unquoted number — ElementPath only knows quoted equality
        or re.search(r"\[[^\]]*[<>]", s) is not None
        or re.search(r"=\s*-?\d", s) is not None
        # a '/' inside a predicate: location-path operand ([a/b = 'v']) —
        # the expression fallback evaluates child-axis paths; a '/' inside
        # a quoted literal routes here too, harmlessly (the stepwise
        # evaluator handles quoted equality)
        or re.search(r"\[[^\]]*/", s) is not None
    )


def _xpath_elements(root: ET.Element, p: str) -> list[ET.Element]:
    if _xp_needs_stepwise(p) or "::" in p or ".." in p:
        return _xpath_steps_eval(root, p)
    try:
        if p.startswith("//"):
            return root.findall("." + p)  # './/x' anywhere
        if p.startswith("/"):
            # absolute: ElementTree paths are relative to root's children,
            # and our wrapper's children ARE the document element(s)
            return root.findall(p.lstrip("/"))
        return root.findall(p)
    except SyntaxError as e:
        # full-XPath-1.0 forms beyond the stepwise evaluator's surface
        # (xmlquery evaluates all of XPath 1.0, xmlelement.go:26-42):
        # loud reject
        raise ValueError(f"unsupported XPath {p!r}: {e}") from None


def _xpath_split_steps(p: str) -> list[tuple[bool, str]]:
    """Path -> [(descendant_axis, step_text)] ('//x/y//z' splits on '/'
    outside predicates; a '//' separator marks its right-hand step).
    Quote-aware: '[', ']' and '/' inside a string literal (e.g.
    ``//a[contains(@href,']/x')]``) are content, not structure."""
    steps: list[tuple[bool, str]] = []
    desc = False
    i = 0
    if p.startswith("//"):
        desc, i = True, 2
    elif p.startswith("/"):
        i = 1
    buf: list[str] = []
    depth = 0
    quote = ""
    n = len(p)
    while i < n:
        ch = p[i]
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"" and depth > 0:
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        elif ch == "/" and depth == 0:
            steps.append((desc, "".join(buf)))
            buf = []
            if i + 1 < n and p[i + 1] == "/":
                desc, i = True, i + 2
            else:
                desc, i = False, i + 1
            continue
        buf.append(ch)
        i += 1
    steps.append((desc, "".join(buf)))
    if any(not s.strip() for _, s in steps):
        raise ValueError(f"empty step in XPath {p!r}")
    return steps


def _xp_pred_bodies(preds_s: str, path: str) -> list[str]:
    """Split a step's consecutive ``[...]`` groups into their bodies,
    quote-aware (a ']' inside a string literal does not close the group)."""
    s = preds_s.strip()
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if s[i] != "[":
            raise ValueError(f"unsupported predicate syntax in XPath {path!r}")
        depth, j, quote = 1, i + 1, ""
        while j < n:
            ch = s[j]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "'\"":
                quote = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth:
            raise ValueError(f"unbalanced predicate brackets in XPath {path!r}")
        out.append(s[i + 1:j])
        i = j + 1
    return out


def _xp_norm_space(s: str) -> str:
    """XPath 1.0 normalize-space(): trim + collapse whitespace runs."""
    return " ".join(s.split())


def _xp_subject_value(e: ET.Element, subj: str) -> str | None:
    """String-value of a predicate subject for one element (None = absent).

    Child-element subjects take the FIRST child with that tag — XPath's
    string() of a node-set."""
    m = re.fullmatch(r"normalize-space\(\s*(.*?)\s*\)", subj)
    if m:
        v = _xp_subject_value(e, m.group(1) or ".")
        return None if v is None else _xp_norm_space(v)
    if subj == "text()":
        return _direct_text(e)
    if subj == ".":
        return text_content(e)
    if subj.startswith("@"):
        return e.get(subj[1:])
    mf = _XP_STRFN_CALL.fullmatch(subj)
    if mf:
        return _xp_strfn_value(e, mf.group(1), mf.group(2))
    return next((text_content(c) for c in e if c.tag == subj), None)


_XP_STRFN_CALL = re.compile(
    r"(substring-before|substring-after|substring|translate)\((.*)\)$", re.S
)


def _xp_strfn_value(e: ET.Element, fn: str, argstr: str) -> str | None:
    """Evaluate a string-function subject for one element. First args may
    be any subject or a quoted literal; substring()'s numeric args must be
    literals (XPath rounds them: floor(x+0.5)); translate()'s from/to args
    follow first-mapping-wins, unmapped-surplus-deleted semantics. An
    absent base subject (e.g. a missing attribute) propagates None so the
    enclosing comparison is false, matching this module's @attr handling."""
    args = _split_top_level(argstr, ",")

    def sval(a: str) -> str | None:
        m = re.fullmatch(r"(['\"])(.*)\1", a, re.S)
        return m.group(2) if m else _xp_subject_value(e, a)

    if not args or args[0] == "":
        raise ValueError(f"{fn}() needs arguments in XPath predicate")
    base = sval(args[0])
    if base is None:
        return None
    if fn == "substring":
        if len(args) not in (2, 3):
            raise ValueError(f"substring() takes 2-3 args, got {len(args)}")
        try:
            nums = [math.floor(float(a) + 0.5) for a in args[1:]]
        except ValueError:
            raise ValueError(
                f"substring() position args must be numeric literals: {args[1:]}"
            ) from None
        lo = max(1, nums[0])
        hi = nums[0] + nums[1] if len(nums) == 2 else len(base) + 1
        return base[lo - 1:max(lo - 1, hi - 1)]
    if fn in ("substring-before", "substring-after"):
        if len(args) != 2:
            raise ValueError(f"{fn}() takes 2 args, got {len(args)}")
        sep = sval(args[1]) or ""
        if not sep:
            return ""
        pre, found, rest = base.partition(sep)
        if not found:
            return ""
        return pre if fn == "substring-before" else rest
    # translate(base, from, to)
    if len(args) != 3:
        raise ValueError(f"translate() takes 3 args, got {len(args)}")
    frm, to = sval(args[1]) or "", sval(args[2]) or ""
    table: dict[str, str | None] = {}
    for i, ch in enumerate(frm):
        if ch not in table:
            table[ch] = to[i] if i < len(to) else None
    out = []
    for ch in base:
        if ch in table:
            if table[ch] is not None:
                out.append(table[ch])
        else:
            out.append(ch)
    return "".join(out)


def _xp_elem_test(body: str, path: str):
    """Compile an element-wise (non-positional) predicate body into a
    callable(el) -> bool. Positional forms are list-level and handled by
    _xpath_apply_preds; inside not() they are rejected loudly."""
    body = body.strip()
    if (
        re.fullmatch(r"\d+", body) or body == "last()"
        or _XP_LAST_MINUS.match(body) or _XP_POSITION_PRED.match(body)
    ):
        raise ValueError(
            f"positional predicate inside not() in XPath {path!r}"
        )
    mn = re.fullmatch(r"not\((.*)\)", body, re.S)
    if mn:
        inner = _xp_elem_test(mn.group(1), path)
        return lambda e: not inner(e)
    mc = _XP_FUNC_PRED.match(body)
    if mc:
        fn, subj, needle = mc.group(1), mc.group(2), mc.group(4)
        if fn == "contains":
            def test(hay: str) -> bool:
                return needle in hay
        else:  # starts-with
            def test(hay: str) -> bool:
                return hay.startswith(needle)
        return lambda e: (
            (v := _xp_subject_value(e, subj)) is not None and test(v)
        )
    me = _XP_TEXT_EQ_PRED.match(body)
    if me:
        subj, lit = me.group(1), me.group(3)
        if (
            subj in ("text()", ".") or subj.startswith("@")
            or subj.startswith("normalize-space")
            or _XP_STRFN_CALL.fullmatch(subj)
        ):
            return lambda e: _xp_subject_value(e, subj) == lit
        # [tag='v'] — ElementPath's child-equality form: ANY child matches
        return lambda e: any(
            c.tag == subj and text_content(c) == lit for c in e
        )
    mq = re.fullmatch(_XP_SUBJECT + r"\s*!=\s*(['\"])((?:(?!\2).)*)\2", body)
    if mq:
        subj, lit = mq.group(1), mq.group(3)
        if (
            subj in ("text()", ".") or subj.startswith("@")
            or subj.startswith("normalize-space")
            or _XP_STRFN_CALL.fullmatch(subj)
        ):
            # empty node-set (absent attr/text) compares false, per XPath
            return lambda e: (
                (v := _xp_subject_value(e, subj)) is not None and v != lit
            )
        # [tag!='v'] — node-set comparison: ANY child with a differing value
        return lambda e: any(
            c.tag == subj and text_content(c) != lit for c in e
        )
    mnum = _XP_NUM_PRED.fullmatch(body)
    if mnum:
        subj, op, rhs = mnum.group(1).strip(), mnum.group(2), float(mnum.group(3))
        vals = _xp_numeric_values(subj, path)
        cmpf = _XP_NUM_OPS[op]
        return lambda e: any(cmpf(v, rhs) for v in vals(e))
    if re.fullmatch(r"@[\w:-]+", body):
        return lambda e: e.get(body[1:]) is not None
    if re.fullmatch(r"[\w:-]+", body):
        # [tag] — a child element with that tag exists
        return lambda e: any(c.tag == body for c in e)
    raise ValueError(f"unsupported predicate [{body}] in XPath {path!r}")


def _xp_num(s: str | None) -> float | None:
    """XPath number() of a string-value: leading/trailing space stripped,
    decimal literal, else NaN — represented as None (comparisons false)."""
    if s is None:
        return None
    try:
        return float(s.strip())
    except ValueError:
        return None


def _xp_numeric_values(subj: str, path: str):
    """Compile a numeric-comparison subject into callable(el) ->
    list[float]: count(child-test) and string-length(subject) plus every
    string subject via number(); child-tag subjects yield one value per
    matching child (XPath node-set comparison: ANY node may satisfy)."""
    mm = re.fullmatch(r"(.*?)\s+mod\s+(-?\d+(?:\.\d+)?)", subj)
    if mm:
        inner = _xp_numeric_values(mm.group(1).strip(), path)
        d = float(mm.group(2))
        if d == 0:
            return lambda e: []  # x mod 0 is NaN — comparisons false
        # XPath mod keeps the dividend's sign, i.e. C fmod, not Python %
        return lambda e: [math.fmod(v, d) for v in inner(e)]
    mc = re.fullmatch(r"count\(\s*(\*|[\w:-]+)\s*\)", subj)
    if mc:
        tag = mc.group(1)
        return lambda e: [float(sum(1 for c in e if tag in ("*", c.tag)))]
    ms = re.fullmatch(r"string-length\(\s*(.*?)\s*\)", subj)
    if ms:
        inner = ms.group(1) or "."
        return lambda e: (
            [] if (v := _xp_subject_value(e, inner)) is None
            else [float(len(v))]
        )
    if (
        subj in ("text()", ".") or re.fullmatch(r"@[\w:-]+", subj)
        or subj.startswith("normalize-space")
        or _XP_STRFN_CALL.fullmatch(subj)
    ):
        # '@x' must match EXACTLY — '@x + 1' (arithmetic) falls through to
        # the loud reject below instead of silently probing attr 'x + 1'
        return lambda e: (
            [n] if (n := _xp_num(_xp_subject_value(e, subj))) is not None
            else []
        )
    if re.fullmatch(r"-?\d+(?:\.\d+)?", subj):
        # a number literal is its own value, not a child-tag probe
        return lambda e, f=float(subj): [f]
    if re.fullmatch(r"[\w:-]+", subj):
        return lambda e: [
            n for c in e if c.tag == subj
            if (n := _xp_num(text_content(c))) is not None
        ]
    raise ValueError(
        f"unsupported numeric-comparison subject {subj!r} in XPath {path!r}"
    )


# ---- general XPath 1.0 predicate-expression fallback ----------------------
# The regex special forms above pin the overwhelmingly common predicate
# shapes; bodies they reject — boolean and/or, arithmetic, computed-vs-
# computed comparisons like [position() < last()], concat(), nested function
# calls — fall back to this recursive-descent evaluator of XPath 1.0 §3
# expressions (OrExpr on down; value operands only — location-path operands
# beyond @attr / child-tag / text() / '.' stay loud rejects, as does any
# body neither layer can parse). xmlquery, the reference's XPath engine
# (/root/reference/xmlelement.go:26-42), evaluates all of XPath 1.0.

_XP_EXPR_NAME = r"[A-Za-z_]\w*(?:[-:][A-Za-z_]\w*)*"
_XP_EXPR_TOK = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?|\.\d+)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<at>@" + _XP_EXPR_NAME + r")"
    r"|(?P<name>" + _XP_EXPR_NAME + r")"
    r"|(?P<op>!=|<=|>=|[=<>+\-*(),./]))"
)


def _xp_truthy(v) -> bool:
    """XPath boolean() of an evaluator value (node-set = non-empty,
    number = non-zero non-NaN, string = non-empty)."""
    if isinstance(v, list):
        return bool(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    return bool(v)


def _xp_tonum(v) -> float:
    """XPath number(): node-set via string-value of the first node;
    unparseable strings are NaN (so comparisons with them are false,
    except != which is true, per IEEE — the spec's rule)."""
    if isinstance(v, list):
        v = v[0] if v else ""
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    n = _xp_num(v)
    return float("nan") if n is None else n


def _xp_tostr(v) -> str:
    """XPath string(): first node of a node-set ('' when empty); integral
    numbers print without a decimal point."""
    if isinstance(v, list):
        return v[0] if v else ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return v


def _xp_cmp(a, b, op: str) -> bool:
    """XPath 1.0 §3.4 comparison: node-sets compare existentially; =/!=
    pick bool > number > string by operand type; relational ops always
    compare as numbers."""
    ns_a, ns_b = isinstance(a, list), isinstance(b, list)
    if op in ("=", "!="):
        if ns_a and ns_b:
            return any(_xp_cmp(x, y, op) for x in a for y in b)
        if ns_a or ns_b:
            ns, other = (a, b) if ns_a else (b, a)
            if isinstance(other, bool):
                got = _xp_truthy(ns)
                return got == other if op == "=" else got != other
            if isinstance(other, float):
                return any(
                    _xp_cmp(_xp_tonum(x), other, op) for x in ns
                )
            return any(
                (x == other) if op == "=" else (x != other) for x in ns
            )
        if isinstance(a, bool) or isinstance(b, bool):
            x, y = _xp_truthy(a), _xp_truthy(b)
        elif isinstance(a, float) or isinstance(b, float):
            x, y = _xp_tonum(a), _xp_tonum(b)
        else:
            x, y = a, b
        return x == y if op == "=" else x != y
    f = _XP_NUM_OPS[op]
    av = [_xp_tonum(x) for x in a] if ns_a else [_xp_tonum(a)]
    bv = [_xp_tonum(x) for x in b] if ns_b else [_xp_tonum(b)]
    return any(f(x, y) for x in av for y in bv)


class _XpExprParser:
    """Recursive-descent compiler for a predicate body. Every parse method
    returns ``callable(ctx) -> value`` where ctx = (element, position,
    size) — position/size are this predicate's per-context XPath values,
    supplied by :func:`_xpath_apply_preds`."""

    def __init__(self, body: str, path: str):
        self.src, self.path = body, path
        self.toks: list[tuple[str, str]] = []
        i, n = 0, len(body)
        while i < n:
            m = _XP_EXPR_TOK.match(body, i)
            if not m:
                if body[i:].strip() == "":
                    break
                self.fail()
            i = m.end()
            for kind in ("num", "str", "at", "name", "op"):
                v = m.group(kind)
                if v is not None:
                    self.toks.append((kind, v))
                    break
        self.i = 0

    def fail(self):
        raise ValueError(
            f"unsupported predicate [{self.src}] in XPath {self.path!r}"
        )

    def peek(self) -> tuple[str | None, str | None]:
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self) -> tuple[str | None, str | None]:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, op: str) -> None:
        if self.take() != ("op", op):
            self.fail()

    def compile(self):
        prog = self.or_()
        if self.i != len(self.toks):
            self.fail()
        return prog

    def _chain(self, sub, seps: tuple[str, ...], kind: str):
        node = sub()
        while self.peek()[0] == kind and self.peek()[1] in seps:
            _, op = self.take()
            rhs = sub()
            node = self._binop(node, op, rhs)
        return node

    @staticmethod
    def _binop(l, op, r):
        if op == "or":
            return lambda c: _xp_truthy(l(c)) or _xp_truthy(r(c))
        if op == "and":
            return lambda c: _xp_truthy(l(c)) and _xp_truthy(r(c))
        if op in _XP_NUM_OPS:
            return lambda c: _xp_cmp(l(c), r(c), op)
        if op == "+":
            return lambda c: _xp_tonum(l(c)) + _xp_tonum(r(c))
        if op == "-":
            return lambda c: _xp_tonum(l(c)) - _xp_tonum(r(c))
        if op == "*":
            return lambda c: _xp_tonum(l(c)) * _xp_tonum(r(c))
        if op == "div":  # IEEE: x div 0 is ±Infinity, 0 div 0 NaN
            def fdiv(c):
                x, y = _xp_tonum(l(c)), _xp_tonum(r(c))
                if y == 0:
                    return float("nan") if x == 0 or x != x else math.copysign(
                        float("inf"), x) * math.copysign(1.0, y)
                return x / y
            return fdiv
        # mod: keeps the dividend's sign (C fmod), x mod 0 is NaN
        def fmod(c):
            x, y = _xp_tonum(l(c)), _xp_tonum(r(c))
            return float("nan") if y == 0 else math.fmod(x, y)
        return fmod

    def or_(self):
        return self._chain(self.and_, ("or",), "name")

    def and_(self):
        return self._chain(self.eq_, ("and",), "name")

    def eq_(self):
        return self._chain(self.rel_, ("=", "!="), "op")

    def rel_(self):
        return self._chain(self.add_, ("<", "<=", ">", ">="), "op")

    def add_(self):
        return self._chain(self.mul_, ("+", "-"), "op")

    def mul_(self):
        node = self.unary_()
        while (self.peek() == ("op", "*")
               or (self.peek()[0] == "name" and self.peek()[1] in ("div", "mod"))):
            _, op = self.take()
            node = self._binop(node, op, self.unary_())
        return node

    def unary_(self):
        if self.peek() == ("op", "-"):
            self.take()
            inner = self.unary_()
            return lambda c: -_xp_tonum(inner(c))
        return self.primary_()

    def primary_(self):
        k, v = self.peek()
        if k == "op" and v == "(":
            self.take()
            e = self.or_()
            self.expect(")")
            return e
        if k == "num":
            self.take()
            return lambda c, f=float(v): f
        if k == "str":
            self.take()
            return lambda c, s=v[1:-1]: s
        if k == "at":
            self.take()
            name = v[1:]
            return lambda c: (
                [a] if (a := c[0].get(name)) is not None else []
            )
        if k == "op" and v == ".":
            self.take()
            if self.peek() == ("op", "/"):
                # './x' / './/x': a context-relative path ('//' = any
                # descendant); the leading '.' contributes no step
                return self.relpath_(None)
            return lambda c: text_content(c[0])
        if k == "op" and v == "*":
            # '*' at a value position: the all-children node-set
            # (count(*)), continuing into a path if one follows ([*/sku])
            self.take()
            return self.relpath_("*")
        if k == "name":
            self.take()
            if self.peek() == ("op", "("):
                self.take()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.or_())
                    while self.peek() == ("op", ","):
                        self.take()
                        args.append(self.or_())
                self.expect(")")
                return self.fn_(v, args)
            return self.relpath_(v)
        self.fail()

    def relpath_(self, first: str | None):
        """A relative location path as a value operand — ``a``, ``a/b/c``,
        ``a/@href``, ``a/text()``, ``.//img``, ``a//b``, wildcard steps —
        evaluated to the node-set of string-values ('/' in an expression
        is always a path separator; XPath spells division ``div``).
        ``first`` is the already-consumed leading child step, or None for
        a context-relative path starting at '.'. Other axes inside
        predicates stay unsupported (no axis tokens, loud parse fail)."""
        steps: list[tuple[bool, str]] = []  # (descendant, tag)
        if first is not None:
            steps.append((False, first))
        tail = None  # ('attr', name) | ('text',)
        while self.peek() == ("op", "/"):
            self.take()
            desc = False
            if self.peek() == ("op", "/"):
                self.take()
                desc = True
            k, v = self.peek()
            if k == "at":
                self.take()
                tail = ("attr", v[1:])
                if desc:
                    self.fail()  # '//@x' — attribute of ANY descendant:
                    # ambiguous with the final-step '@' surface, reject
                break
            if k == "name" and v == "text" and (
                self.i + 1 < len(self.toks) and self.toks[self.i + 1] == ("op", "(")
            ):
                self.take()
                self.take()
                self.expect(")")
                tail = ("text",)
                break
            if k == "op" and v == "*":
                self.take()
                steps.append((desc, "*"))
                continue
            if k != "name":
                self.fail()
            self.take()
            steps.append((desc, v))
        if not steps:
            self.fail()  # './' with no step

        def walk(c):
            frontier = [c[0]]
            for desc, tag in steps:
                nxt, seen = [], set()
                for n in frontier:
                    cand = (
                        (ch for ch in n.iter() if ch is not n)
                        if desc else iter(n)
                    )
                    for ch in cand:
                        if (tag == "*" or ch.tag == tag) and id(ch) not in seen:
                            seen.add(id(ch))
                            nxt.append(ch)
                frontier = nxt
            if tail is None:
                return [text_content(n) for n in frontier]
            if tail[0] == "attr":
                return [
                    a for n in frontier
                    if (a := n.get(tail[1])) is not None
                ]
            return [t for n in frontier if (t := _direct_text(n))]
        return walk

    def fn_(self, name: str, args: list):
        na = len(args)

        def need(lo: int, hi: int | None = None):
            if not lo <= na <= (lo if hi is None else hi):
                self.fail()

        if name == "position":
            need(0)
            return lambda c: float(c[1])
        if name == "last":
            need(0)
            return lambda c: float(c[2])
        if name == "text":
            need(0)
            return lambda c: [t] if (t := _direct_text(c[0])) else []
        if name == "name":
            need(0)
            return lambda c: c[0].tag
        if name == "count":
            need(1)
            a = args[0]

            def count(c):
                v = a(c)
                if not isinstance(v, list):
                    self.fail()
                return float(len(v))
            return count
        if name == "not":
            need(1)
            a = args[0]
            return lambda c: not _xp_truthy(a(c))
        if name == "true":
            need(0)
            return lambda c: True
        if name == "false":
            need(0)
            return lambda c: False
        if name == "boolean":
            need(1)
            a = args[0]
            return lambda c: _xp_truthy(a(c))
        if name == "number":
            need(0, 1)
            a = args[0] if args else (lambda c: text_content(c[0]))
            return lambda c: _xp_tonum(a(c))
        if name == "string":
            need(0, 1)
            a = args[0] if args else (lambda c: text_content(c[0]))
            return lambda c: _xp_tostr(a(c))
        if name == "concat":
            need(2, 99)
            return lambda c: "".join(_xp_tostr(a(c)) for a in args)
        if name in ("contains", "starts-with"):
            need(2)
            a, b = args
            if name == "contains":
                return lambda c: _xp_tostr(b(c)) in _xp_tostr(a(c))
            return lambda c: _xp_tostr(a(c)).startswith(_xp_tostr(b(c)))
        if name == "normalize-space":
            need(0, 1)
            a = args[0] if args else (lambda c: text_content(c[0]))
            return lambda c: _xp_norm_space(_xp_tostr(a(c)))
        if name == "string-length":
            need(0, 1)
            a = args[0] if args else (lambda c: text_content(c[0]))
            return lambda c: float(len(_xp_tostr(a(c))))
        if name == "substring":
            need(2, 3)
            b, st = args[0], args[1]
            ln = args[2] if na == 3 else None

            def substr(c):
                s = _xp_tostr(b(c))
                p = _xp_tonum(st(c))
                if p != p:  # NaN start selects nothing
                    return ""
                p = math.floor(max(-1e9, min(1e9, p)) + 0.5)
                if ln is None:
                    return s[max(1, p) - 1:]
                k = _xp_tonum(ln(c))
                if k != k:
                    return ""
                # clamp infinities before floor (floor(inf) overflows)
                k = max(-1e9, min(1e9, k))
                end = p + math.floor(k + 0.5)
                lo = max(1, p)
                return s[lo - 1:max(lo - 1, int(min(end, len(s) + 1)) - 1)]
            return substr
        if name in ("substring-before", "substring-after"):
            need(2)
            a, b = args
            before = name == "substring-before"

            def part(c):
                base, sep = _xp_tostr(a(c)), _xp_tostr(b(c))
                if not sep:
                    return ""
                pre, found, rest = base.partition(sep)
                if not found:
                    return ""
                return pre if before else rest
            return part
        if name == "translate":
            need(3)
            a, b, d = args

            def trans(c):
                base, frm, to = _xp_tostr(a(c)), _xp_tostr(b(c)), _xp_tostr(d(c))
                table: dict[str, str | None] = {}
                for i, ch in enumerate(frm):
                    if ch not in table:
                        table[ch] = to[i] if i < len(to) else None
                return "".join(
                    (table[ch] if table[ch] is not None else "")
                    if ch in table else ch
                    for ch in base
                )
            return trans
        self.fail()


def _xp_expr_compile(body: str, path: str):
    return _XpExprParser(body, path).compile()


@functools.lru_cache(maxsize=512)
def _xp_compile_body(body: str, path: str):
    """Compile one predicate body once per (body, path): the pinned
    element-test forms first, else the expression fallback. Cached because
    ``//tag[pred]`` applies predicates once PER PARENT node — without the
    cache a 10k-element page recompiles the same regexes and closures 10k
    times inside the Arrow-batched parse hot path. Both compilers are pure
    (closures over the body text only); the returned tag says whether the
    program needs (element) or (element, position, size)."""
    try:
        return ("test", _xp_elem_test(body, path))
    except ValueError:
        return ("expr", _xp_expr_compile(body, path))


@functools.lru_cache(maxsize=512)
def _xp_pred_bodies_cached(preds_s: str, path: str) -> tuple[str, ...]:
    return tuple(_xp_pred_bodies(preds_s, path))


def _xpath_apply_preds(
    cand: list[ET.Element], preds_s: str, path: str
) -> list[ET.Element]:
    """Apply a step's ``[...]`` predicates in order to a candidate list that
    is already in this step's axis order for ONE context node — so a
    positional ``[n]`` / ``[last()-k]`` / ``[position() OP k]`` is XPath's
    per-context position (and counts from the nearest sibling on the
    reverse ``preceding-sibling::`` axis)."""
    for body in _xp_pred_bodies_cached(preds_s, path):
        body = body.strip()
        mp = _XP_POSITION_PRED.match(body)
        ml = _XP_LAST_MINUS.match(body)
        if mp or ml or body == "last()" or re.fullmatch(r"\d+", body):
            if mp:
                mod_n = int(mp.group(1)) if mp.group(1) else 0
                op, k = mp.group(2), int(mp.group(3))
                cmp = {
                    "=": lambda i: i == k, "!=": lambda i: i != k,
                    "<": lambda i: i < k, "<=": lambda i: i <= k,
                    ">": lambda i: i > k, ">=": lambda i: i >= k,
                }[op]
                # [position() mod N OP K] — odd/even-style selection;
                # positions are 1-based so Python % matches XPath mod here
                pos = (lambda i: i % mod_n) if mod_n else (lambda i: i)
                cand = [e for i, e in enumerate(cand, 1) if cmp(pos(i))]
            elif ml:
                i = len(cand) - 1 - int(ml.group(1))
                cand = [cand[i]] if i >= 0 else []
            elif body == "last()":
                cand = cand[-1:]
            else:
                k = int(body)
                cand = [cand[k - 1]] if len(cand) >= k else []
        else:
            kind, prog = _xp_compile_body(body, path)
            if kind == "test":
                cand = [e for e in cand if prog(e)]
            else:
                # general XPath 1.0 expression fallback — and/or,
                # arithmetic, computed comparisons, concat(), positional
                # terms inside boolean structure (position()/last() get
                # THIS predicate's per-context values)
                size = len(cand)
                cand = [
                    e for i, e in enumerate(cand, 1)
                    if _xp_truthy(prog((e, i, size)))
                ]
    return cand


def _xpath_steps_eval(root: ET.Element, p: str) -> list[ET.Element]:
    """Stepwise evaluation for paths ElementPath can't take whole: steps
    with ``contains()`` predicates and the parent/self/sibling axes. Each
    step maps the current node-set through its axis per context node, then
    dedups and re-sorts to document order (XPath node-set semantics)."""
    doc_order = {id(e): i for i, e in enumerate(root.iter())}
    parent_of: dict[int, ET.Element] = {
        id(c): par for par in root.iter() for c in par
    }
    nodes: list[ET.Element] = [root]
    for desc, raw in _xpath_split_steps(p):
        step = raw.strip()
        if step.startswith("@"):
            # the attribute axis as a NON-final step: attribute nodes have
            # no element children, so nothing downstream could match —
            # reject loudly (final-step @attr is handled by xpath_select)
            raise ValueError(f"attribute axis mid-path in XPath {p!r}")
        nxt: list[ET.Element] = []
        if step == "..":
            step = "parent::*"
        ma = _XP_AXIS_STEP.match(step)
        if ma:
            axis, tag, preds = ma.group(1), ma.group(2), ma.group(3)
            if desc:
                raise ValueError(f"'//' before an axis step in XPath {p!r}")
            for node in nodes:
                par = parent_of.get(id(node))
                if axis == "self":
                    cand = [node]
                elif axis == "parent":
                    cand = [par] if par is not None and par.tag != "__root__" else []
                elif axis in ("ancestor", "ancestor-or-self"):
                    # reverse axis: nearest-first ([1] is the closest)
                    cand = [node] if axis == "ancestor-or-self" else []
                    anc = par
                    while anc is not None and anc.tag != "__root__":
                        cand.append(anc)
                        anc = parent_of.get(id(anc))
                elif axis in ("descendant", "descendant-or-self"):
                    cand = list(node.iter())  # doc order, self first
                    if axis == "descendant":
                        cand = cand[1:]
                elif axis in ("following", "preceding"):
                    at = doc_order.get(id(node), 0)
                    if axis == "following":
                        # doc order after the node, minus its own subtree
                        sub = {id(e) for e in node.iter()}
                        cand = [
                            e for e in root.iter()
                            if doc_order[id(e)] > at and id(e) not in sub
                        ]
                    else:
                        # reverse axis: before the node, minus its
                        # ancestors, nearest-first
                        anc = set()
                        a = par
                        while a is not None:
                            anc.add(id(a))
                            a = parent_of.get(id(a))
                        cand = [
                            e for e in root.iter()
                            if doc_order[id(e)] < at and id(e) not in anc
                            and e.tag != "__root__"
                        ][::-1]
                elif par is None:
                    cand = []
                else:
                    sibs = list(par)
                    at = next(i for i, s in enumerate(sibs) if s is node)
                    cand = (
                        sibs[at + 1:]
                        if axis == "following-sibling"
                        else sibs[at - 1::-1] if at else []
                    )
                if tag != "*":
                    cand = [e for e in cand if e.tag == tag]
                nxt.extend(_xpath_apply_preds(cand, preds, p))
        elif _xp_needs_stepwise(step):
            mt = re.match(r"^(\*|[\w:-]+)(.*)$", step)
            if mt is None:
                raise ValueError(f"unsupported step {step!r} in XPath {p!r}")
            tag, preds = mt.group(1), mt.group(2)
            for node in nodes:
                if desc:
                    # '//tag[pred]': predicates — positional ones included —
                    # apply per PARENT (XPath's proximity rule: position()
                    # counts within each child:: node-list, not globally);
                    # the post-step doc-order sort restores global order
                    for par in node.iter():
                        cand = [
                            c for c in par if tag == "*" or c.tag == tag
                        ]
                        nxt.extend(_xpath_apply_preds(cand, preds, p))
                else:
                    cand = node.findall(tag)
                    nxt.extend(_xpath_apply_preds(cand, preds, p))
        else:
            if "::" in step:
                # unhandled axis (ancestor::, following::, ...): ElementPath
                # would silently treat it as a tag name and match nothing
                raise ValueError(f"unsupported axis step {step!r} in XPath {p!r}")
            pat = (".//" if desc else "") + step
            try:
                for node in nodes:
                    nxt.extend(node.findall(pat))
            except SyntaxError as e:
                raise ValueError(f"unsupported XPath {p!r}: {e}") from None
        seen: set[int] = set()
        nodes = []
        for e in nxt:
            if id(e) not in seen:
                seen.add(id(e))
                nodes.append(e)
        nodes.sort(key=lambda e: doc_order.get(id(e), 1 << 30))
    return nodes


def _xp_sub_outside_quotes(pattern: str, repl: str, p: str) -> str:
    """re.sub applied only to the unquoted segments of an XPath (string
    literals pass through verbatim)."""
    rx = re.compile(pattern)
    out: list[str] = []
    start = 0
    quote = ""
    for i, ch in enumerate(p):
        if quote:
            if ch == quote:
                out.append(p[start:i + 1])  # the quoted run, verbatim
                start = i + 1
                quote = ""
        elif ch in "'\"":
            out.append(rx.sub(repl, p[start:i]))
            start = i
            quote = ch
    out.append(p[start:] if quote else rx.sub(repl, p[start:]))
    return "".join(out)


def _xp_split_union(p: str) -> list[str]:
    """Split an XPath on top-level '|' (outside predicates and string
    literals). A single-operand path returns [p] unchanged."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote = ""
    for ch in p:
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf).strip())
    if any(not s for s in parts):
        raise ValueError(f"empty union operand in XPath {p!r}")
    return parts


def xpath_select(root: ET.Element, xpath: str) -> list:
    """Evaluate colly-test-style XPath over the wrapped tree.

    ``//x`` -> anywhere; ``/x/y`` -> absolute from the document element.
    Predicates supported by ElementTree pass through ([@attr], [@a='v'],
    [tag], and the positional forms [n]/[last()]/[last()-n], evaluated per
    parent exactly like XPath 1.0 — ``//item[1]/title`` is every channel's
    first item title, not the document's first). On top of ElementPath:

    - ``.../text()`` returns the matched elements' direct text (STRING
      results — the sitemap idiom ``//loc/text()``, xmlelement.go:26-42's
      xmlquery evaluates full XPath 1.0);
    - ``.../@attr`` returns attribute value strings (``//img/@src``);
    - ``[contains(@attr, 'v')]`` / ``[contains(text(), 'v')]`` /
      ``[contains(., 'v')]`` predicates in ANY step, and the full XPath 1.0
      element-axis set (``..``/``parent``/``self``, the sibling axes,
      ``ancestor(-or-self)``/``descendant(-or-self)``,
      ``following``/``preceding``), via the stepwise evaluator
      (:func:`_xpath_steps_eval`).
    """
    p = xpath.strip()
    # top-level union: evaluate each operand and merge (node-set union —
    # element results dedup to document order; string results from
    # text()/@attr tails concatenate in operand order). ElementPath would
    # otherwise treat the whole '|' expression as one unmatchable path and
    # silently return [] — the typo'd-selector-as-empty-page failure mode.
    parts = _xp_split_union(p)
    if len(parts) > 1:
        rs = [xpath_select(root, part) for part in parts]
        if all(isinstance(x, str) for r in rs for x in r):
            return [x for r in rs for x in r]
        doc_order = {id(e): i for i, e in enumerate(root.iter())}
        seen: set[int] = set()
        out = []
        for r in rs:
            for e in r:
                if not isinstance(e, ET.Element):
                    raise ValueError(
                        f"mixed element/string union operands in XPath {p!r}"
                    )
                if id(e) not in seen:
                    seen.add(id(e))
                    out.append(e)
        out.sort(key=lambda e: doc_order.get(id(e), 1 << 30))
        return out
    # 'attribute::x' is the verbose spelling of '@x' — normalize up front
    # (final-step only, like '@x'; the attribute axis mid-path stays a
    # loud reject since attribute nodes have no element children). Applied
    # per unquoted segment: a string literal containing '/attribute::'
    # is content and must not be rewritten.
    p = _xp_sub_outside_quotes(
        r"(?<=[/\[(])attribute::(?=[\w:-])", "@", p
    )
    tail = None  # ('text',) | ('attr', name)
    if p.endswith("/text()"):
        tail = ("text",)
        p = p[: -len("/text()")]
    else:
        m = _XP_ATTR_TAIL.search(p)
        if m:
            tail = ("attr", m.group(1))
            p = p[: m.start()]
    els = _xpath_elements(root, p)
    if tail is None:
        return els
    if tail[0] == "text":
        out = [_direct_text(e) for e in els]
        return [t for t in out if t]
    return [e.get(tail[1]) for e in els if e.get(tail[1]) is not None]


def _direct_text(el: ET.Element) -> str:
    """Concatenated DIRECT text-node children (what ``text()`` selects —
    child elements' text excluded, unlike ``text_content``)."""
    parts = [el.text or ""]
    for child in el:
        parts.append(child.tail or "")
    return "".join(parts)
