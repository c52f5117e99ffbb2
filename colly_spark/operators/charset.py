"""Statistical charset detection — the "chardet tail" of P0 DetectCharset.

The reference decodes responses through x/net/html/charset, whose final
fallback is saintfish/chardet (a Go port of Mozilla universalchardet):
response.go:97-106. Rounds 1-4 shipped the deterministic prefix of that
chain (BOM sniff, WHATWG meta prescan, strict-UTF-8 probe) and documented
the statistical detector as THE remaining divergence. This module closes
it from scratch with the same two signals universalchardet uses,
miniaturized (no chardet code or model files):

1. **Structural validity.** Python ships every candidate codec, so a
   strict decode of the sample window does the job of universalchardet's
   per-encoding byte state machines. A window cut mid-character is
   trimmed (up to 3 trailing bytes) so truncation never fails a valid
   stream.

2. **Character-frequency consistency.** Structure alone cannot separate
   the EUC-family encodings — GB2312 bytes are usually valid EUC-KR and
   Big5 sequences too, and Shift-JIS reads GB2312 lead bytes as
   half-width katakana. Universalchardet breaks the tie with language
   frequency tables; here each candidate carries (a) its home Unicode
   script blocks and (b) a ~40-character set of that language's most
   frequent characters (standard public frequency lists). Real text
   decoded by the RIGHT codec puts 20-60% of its characters in the
   frequent set; the same bytes mis-decoded land near the random rate
   (40 / several-thousand-codepoint block, well under 2%), so a small
   floor separates cleanly.

Single-byte encodings (windows-1251, koi8-r, cp1253, cp1255, cp1256) are
bijections over the same byte range, so every candidate "validates" and
block membership ties at 1.0 — frequency is the ONLY separator, plus a
letter-density gate: in Cyrillic/Greek/Hebrew/Arabic text virtually every
letter is a high byte, while accented-Latin text (French, German) is
mostly ASCII — so a < 50% high-byte letter ratio short-circuits to the
Latin family before any lookalike can fire. Within Latin: any 0x80-0x9F
byte selects windows-1252 (the C1 control block is never intentional
latin-1 text, which is why WHATWG maps latin-1 labels to windows-1252),
else latin-1.

Detection runs per-row inside the already-Python extraction kernel over a
bounded 8 KiB sample, only when the body failed the strict-UTF-8 probe —
no new slow path at 100 TB.
"""

from __future__ import annotations

_SAMPLE = 8192
_MIN_EVIDENCE = 4        # fewer non-ASCII chars than this is not evidence
_MIN_BLOCK = 0.70        # home-script fraction a candidate must reach
_MIN_FREQ_MB = 0.05      # frequent-char floor, multibyte (random ~0.6-2%)
_MIN_FREQ_SB = 0.25      # frequent-char floor, single-byte (random ~10%)

# Home-script blocks (Unicode ranges).
_HAN = ((0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x3000, 0x303F),
        (0xFF00, 0xFFEF))
_KANA = ((0x3040, 0x309F), (0x30A0, 0x30FF), (0x31F0, 0x31FF))
_HANGUL = ((0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x3130, 0x318F))
_CYRILLIC = ((0x0400, 0x04FF),)
_GREEK = ((0x0370, 0x03FF),)
_HEBREW = ((0x0590, 0x05FF),)
_ARABIC = ((0x0600, 0x06FF),)

# Most-frequent characters per language — standard public frequency
# lists; membership is what matters, not ranking.
_FREQ_JA = set("のにはをたがとてでしいるなかっれさもんすまこうく、。")
_FREQ_KO = set("이다의에는를하고가지서기로은한것들어게없상했수인우리나아니사되그보안만")
_FREQ_ZH_S = set(
    "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而要于就"
    "下得可你年生自会那后能对着事其里所去行过家十用发天如然作方成者多日都"
)
_FREQ_ZH_T = set(
    "的一是不了人我在有他這為之大來以個中上們到說國和地也子時道出而要於就"
    "下得可你年生自會那後能對著事其裡所去行過家十用發天如然作方成者多日都"
)
_FREQ_RU = set("оеаинтсрвлкмдпуяыьгзбчйхжшюцщэф")
_FREQ_EL = set("αοιετσνηυρπκμλωδγχθφβξζψςάέήίόύώ")
_FREQ_HE = set("יהולארתמשבנעדקחפסכגזטצןם")
_FREQ_AR = set("اليمونهربتكسدعفقحجطشصزخذضغثظةى")

# (codec, home blocks, frequent set); order is the deterministic tie-break.
_MB_CANDIDATES = (
    ("shift_jis", _KANA + _HAN, _FREQ_JA),
    ("euc_jp", _KANA + _HAN, _FREQ_JA),
    ("euc_kr", _HANGUL + _HAN, _FREQ_KO),
    ("gb2312", _HAN, _FREQ_ZH_S),
    ("big5", _HAN, _FREQ_ZH_T),
)
_SB_CANDIDATES = (
    ("windows-1251", _CYRILLIC, _FREQ_RU),
    ("koi8-r", _CYRILLIC, _FREQ_RU),
    ("windows-1253", _GREEK, _FREQ_EL),
    ("windows-1255", _HEBREW, _FREQ_HE),
    ("windows-1256", _ARABIC, _FREQ_AR),
)


def _in_ranges(cp: int, ranges: tuple[tuple[int, int], ...]) -> bool:
    for lo, hi in ranges:
        if lo <= cp <= hi:
            return True
    return False


def _strict_decode_trimmed(sample: bytes, codec: str) -> str | None:
    """Strict decode; a failure within the last 3 bytes is retried on the
    truncated prefix (the sample window may cut a multibyte character)."""
    for cut in range(4):
        view = sample[: len(sample) - cut] if cut else sample
        try:
            return view.decode(codec)
        except UnicodeDecodeError as e:
            if e.start < len(view) - 3:
                return None
        except (ValueError, LookupError):
            return None
    return None


def _scores(
    text: str,
    ranges: tuple[tuple[int, int], ...],
    freq: set[str],
) -> tuple[float, float, int]:
    """(home-block fraction, frequent-char fraction, count) over the
    non-ASCII characters of `text`."""
    block = hits = total = 0
    for ch in text:
        if ord(ch) < 0x80:
            continue
        total += 1
        if _in_ranges(ord(ch), ranges):
            block += 1
        # NO case folding: frequent sets are lowercase on purpose — running
        # text is overwhelmingly lowercase, and the cp1251/koi8-r pair maps
        # each other's lowercase range to UPPERCASE, so folding would hand
        # the lookalike the same score as the real codec.
        if ch in freq:
            hits += 1
    if not total:
        return 0.0, 0.0, 0
    return block / total, hits / total, total


def _detect_multibyte(sample: bytes) -> str | None:
    best: tuple[float, int, str] | None = None
    for idx, (codec, ranges, freq) in enumerate(_MB_CANDIDATES):
        text = _strict_decode_trimmed(sample, codec)
        if text is None:
            continue
        block, fhits, n = _scores(text, ranges, freq)
        if n < _MIN_EVIDENCE or block < _MIN_BLOCK or fhits < _MIN_FREQ_MB:
            continue
        key = (0.5 * block + fhits, -idx, codec)
        if best is None or key > best:
            best = key
    return best[2] if best else None


def _detect_single_byte(sample: bytes) -> str:
    high = sum(1 for b in sample if b >= 0x80)
    letters = sum(
        1 for b in sample if (0x41 <= b <= 0x5A) or (0x61 <= b <= 0x7A)
    ) + high
    if letters and high / letters >= 0.5 and high >= _MIN_EVIDENCE:
        best: tuple[float, int, str] | None = None
        for idx, (codec, ranges, freq) in enumerate(_SB_CANDIDATES):
            if _strict_decode_trimmed(sample, codec) is None:
                continue  # undefined byte for this codec: keep the
                # always-decodes contract (body_text decodes strict)
            text = sample.decode(codec, errors="ignore")
            block, fhits, n = _scores(text, ranges, freq)
            if n < _MIN_EVIDENCE or block < 0.8 or fhits < _MIN_FREQ_SB:
                continue
            key = (fhits, -idx, codec)
            if best is None or key > best:
                best = key
        if best is not None:
            return best[2]
    if any(0x80 <= b <= 0x9F for b in sample):
        # cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D undefined (Python raises
        # where WHATWG maps them to C1); fall back to latin-1 when present
        try:
            sample.decode("windows-1252")
            return "windows-1252"
        except UnicodeDecodeError:
            return "latin-1"
    return "latin-1"


def detect_statistical(body: bytes) -> str:
    """The statistical tail: called only after BOM / meta prescan / strict
    UTF-8 have all passed on the body, i.e. the bytes are NOT valid UTF-8
    and carry no declaration. Always returns a codec (latin-1 decodes
    anything, so the chain is total)."""
    sample = bytes(body[:_SAMPLE])
    mb = _detect_multibyte(sample)
    if mb is not None:
        return mb
    return _detect_single_byte(sample)
