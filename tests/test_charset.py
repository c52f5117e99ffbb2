# Statistical charset detection (the chardet tail of P0 DetectCharset,
# response.go:97-106 — reference uses saintfish/chardet after BOM/meta/
# UTF-8). These pin the from-scratch detector in operators/charset.py on
# real-language samples in every supported encoding, INCLUDING the
# structural-lookalike traps: GB2312 bytes are usually valid EUC-KR /
# Big5 / Shift-JIS sequences too, so only frequency evidence separates
# them.
from colly_spark.operators.charset import detect_statistical
from colly_spark.operators.parse import detect_charset

JA = ("吾輩は猫である。名前はまだ無い。どこで生れたかとんと見当がつかぬ。"
      "何でも薄暗いじめじめした所でニャーニャー泣いていた事だけは記憶している。")
KO = ("모든 국민은 인간으로서의 존엄과 가치를 가지며, 행복을 추구할 권리를 "
      "가진다. 국가는 개인이 가지는 불가침의 기본적 인권을 보장할 의무를 진다.")
ZH_S = ("人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，"
        "并应以兄弟关系的精神相对待。这是世界人权宣言的第一条。")
ZH_T = ("人人生而自由，在尊嚴和權利上一律平等。他們賦有理性和良心，"
        "並應以兄弟關係的精神相對待。這是世界人權宣言的第一條。")
RU = ("Мы все учились понемногу, чему-нибудь и как-нибудь. "
      "Так воспитаньем, слава богу, у нас немудрено блеснуть.")
EL = ("Όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην αξιοπρέπεια "
      "και τα δικαιώματα. Είναι προικισμένοι με λογική και συνείδηση.")
HE = "כל בני האדם נולדו בני חורין ושווים בערכם ובזכויותיהם"
AR = "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق"


def _roundtrip(text, codec):
    data = text.encode(codec)
    got = detect_statistical(data)
    assert data.decode(got) == data.decode(codec), (codec, got)
    return got


def test_multibyte_cjk():
    assert _roundtrip(JA, "shift_jis") == "shift_jis"
    assert _roundtrip(JA, "euc_jp") == "euc_jp"
    assert _roundtrip(KO, "euc_kr") == "euc_kr"
    assert _roundtrip(ZH_S, "gb2312") == "gb2312"
    assert _roundtrip(ZH_T, "big5") == "big5"


def test_lookalike_traps_resolve_by_frequency():
    # GB2312 bytes ARE valid euc_kr/big5 byte sequences for typical text;
    # the decoded characters must still be recognised as Chinese.
    got = detect_statistical(ZH_S.encode("gb2312"))
    assert got == "gb2312"
    got = detect_statistical(KO.encode("euc_kr"))
    assert got == "euc_kr"


def test_single_byte_families():
    assert _roundtrip(RU, "windows-1251") == "windows-1251"
    assert _roundtrip(RU, "koi8-r") == "koi8-r"
    assert _roundtrip(EL, "windows-1253") == "windows-1253"
    assert _roundtrip(HE, "windows-1255") == "windows-1255"
    assert _roundtrip(AR, "windows-1256") == "windows-1256"


def test_latin_family_not_misread():
    # accented-Latin text is mostly ASCII: the density gate must keep it
    # OUT of the Cyrillic/Greek lookalikes
    fr = "café détour, une journée très agréable à Orléans"
    assert detect_statistical(fr.encode("latin-1")) == "latin-1"
    # smart quotes live in 0x80-0x9F: windows-1252, never latin-1 C1
    w = "he said “hello” — and left…"
    assert detect_statistical(w.encode("windows-1252")) == "windows-1252"


def test_truncated_multibyte_sample():
    # a window cut mid-character must not fail the structural probe
    data = JA.encode("euc_jp")[:-1]
    assert detect_statistical(data) == "euc_jp"


def test_chain_precedence_unchanged():
    # BOM, declared meta, and strict UTF-8 still win before statistics
    assert detect_charset("ü".encode("utf-8-sig")) == "utf-8-sig"
    assert detect_charset(b"<meta charset=koi8-r>" + RU.encode("koi8-r")) == "koi8-r"
    assert detect_charset(JA.encode("utf-8")) == "utf-8"
    # undeclared legacy bytes now reach the statistical tail
    assert detect_charset(RU.encode("windows-1251")) == "windows-1251"
    assert detect_charset(JA.encode("shift_jis")) == "shift_jis"


def test_garbage_falls_back_total():
    # arbitrary invalid-UTF8 noise still yields a codec that decodes
    noise = bytes(range(256)) * 4
    got = detect_statistical(noise)
    noise.decode(got)  # must not raise
