"""Language analysis: Snowball stemmers, stop sets, per-language analyzers
(reference registrations CommonAnalysisPlugin.java:180-223; stemmer names per
StemmerTokenFilterFactory). Golden vectors traced through the published
algorithm descriptions (snowballstem.org)."""

from __future__ import annotations

import pytest

from elasticsearch_ray.analyzer import get_analyzer
from elasticsearch_ray.lang import SNOWBALL_STEMMERS, STOP_SETS, snowball_stem

GOLDEN = {
    "german": [
        ("kinder", "kind"), ("kindern", "kind"), ("bücher", "buch"),
        ("schönes", "schon"), ("aufregung", "aufreg"), ("häuser", "haus"),
        ("gelaufen", "gelauf"), ("arbeitet", "arbeitet"),
        # lich needs R2: freundlich keeps its suffix (R2 starts past it)
        ("freundlich", "freundlich"), ("möglichkeit", "moglich"),
    ],
    "french": [
        ("continuer", "continu"), ("majestueusement", "majestu"),
        ("chanterions", "chant"), ("mangeaient", "mang"),
        ("nationale", "national"), ("nationaux", "national"),
        ("grandes", "grand"), ("parlait", "parl"), ("école", "écol"),
    ],
    "spanish": [
        ("niñas", "niñ"), ("corriendo", "corr"), ("caminando", "camin"),
        ("rápidamente", "rapid"), ("comieron", "com"),
        ("generosidad", "gener"),
    ],
    "italian": [
        ("abbandonata", "abbandon"), ("nazionale", "nazional"),
        ("mangiare", "mang"), ("bellissimo", "bellissim"),
    ],
    "portuguese": [
        ("meninas", "menin"), ("falando", "fal"), ("rapidamente", "rapid"),
    ],
    "dutch": [
        ("lichamelijk", "licham"), ("kinderen", "kinder"),
        ("huizen", "huiz"), ("mogelijkheden", "mogelijk"),
        ("speelden", "speeld"),
    ],
    "russian": [
        ("книгами", "книг"), ("красивый", "красив"), ("играли", "игра"),
        ("бегущий", "бегущ"), ("важность", "важност"),
    ],
    "swedish": [
        ("flickorna", "flick"), ("hundarna", "hund"), ("bilarnas", "bil"),
        ("möjligheterna", "möj"),
    ],
    "norwegian": [
        ("guttene", "gutt"), ("husene", "hus"), ("vakkert", "vakker"),
        ("mulighetene", "mulig"),
    ],
    "danish": [
        ("pigerne", "pig"), ("husene", "hus"), ("mulighederne", "mulighed"),
    ],
    "arabic": [
        ("الكتاب", "كتاب"), ("والمدرسة", "مدرس"), ("كتابها", "كتاب"),
        ("مدرسون", "مدرس"),
    ],
}


@pytest.mark.parametrize("lang", sorted(GOLDEN))
def test_snowball_golden_vectors(lang):
    stem = SNOWBALL_STEMMERS[lang]
    for word, expected in GOLDEN[lang]:
        assert stem(word) == expected, f"{lang}: {word}"


@pytest.mark.parametrize("lang,variants", [
    ("german", ["kind", "kinder", "kindern"]),
    ("french", ["grand", "grande", "grandes"]),
    ("french", ["national", "nationale", "nationaux"]),
    ("spanish", ["niña", "niñas"]),
    ("italian", ["bambino", "bambini", "bambina"]),
    ("portuguese", ["menina", "meninas"]),
    ("dutch", ["speelde", "speelden"]),
    ("russian", ["книга", "книги", "книгами"]),
    ("swedish", ["hund", "hunden", "hundarna"]),
    ("danish", ["hus", "huset", "husene"]),
    ("arabic", ["كتاب", "الكتاب", "كتابها"]),
])
def test_inflected_variants_share_stem(lang, variants):
    stems = {SNOWBALL_STEMMERS[lang](v) for v in variants}
    assert len(stems) == 1, f"{lang}: {variants} -> {stems}"


@pytest.mark.parametrize("lang", sorted(GOLDEN))
def test_stemmer_idempotent_on_golden(lang):
    stem = SNOWBALL_STEMMERS[lang]
    for word, expected in GOLDEN[lang]:
        # stemming an already-stemmed word must not oscillate wildly;
        # (true idempotence is not a Snowball guarantee, but goldens are
        # stable under a second pass for these vectors)
        assert isinstance(stem(expected), str)


def test_snowball_stem_dispatch():
    assert snowball_stem("german", "kinder") == "kind"
    with pytest.raises(ValueError):
        snowball_stem("klingon", "x")


@pytest.mark.parametrize("lang,text,expected", [
    ("french", "Les enfants jouaient dans l'école nationale",
     ["enfant", "jou", "écol", "national"]),
    ("german", "Die Kinder spielten in den schönen Häusern",
     ["kind", "spielt", "schon", "haus"]),
    ("spanish", "Las niñas corrían rápidamente por el parque",
     ["niñ", "corr", "rapid", "parqu"]),
    ("italian", "I bambini giocavano nell'acqua della fontana",
     ["bambin", "gioc", "acqua", "fontan"]),
    ("portuguese", "As meninas falavam rapidamente",
     ["menin", "fal", "rapid"]),
    ("dutch", "De kinderen speelden in de mooie huizen",
     ["kinder", "speeld", "mooi", "huiz"]),
    ("russian", "Дети играли в красивых домах",
     ["дет", "игра", "красив", "дом"]),
])
def test_language_analyzer_chains(lang, text, expected):
    assert get_analyzer(lang)(text) == expected


def test_stop_sets_cover_function_words():
    assert {"le", "la", "les", "et", "un"} <= STOP_SETS["french"]
    assert {"der", "die", "das", "und"} <= STOP_SETS["german"]
    assert {"el", "la", "los", "y", "de"} <= STOP_SETS["spanish"]
    assert {"и", "в", "не", "на"} <= STOP_SETS["russian"]


def test_elision_strips_articles():
    fr = get_analyzer("french")
    # l' and d' elide; the bare word stays
    assert fr("l'avion d'argent") == fr("avion argent")


def test_nonenglish_field_indexing(ray_session, tmp_path):
    """A German corpus column indexed with the german analyzer via
    extra_content_columns; match query stems the query text the same way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import IndexSearcher

    docs = [
        ("quick brown fox", "die Kinder spielten im Haus"),
        ("lazy dog", "ein schönes Buch über Häuser"),
        ("fox again", "der Hund lief durch den Garten"),
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "repo": ["r"] * 3, "path": [f"f{i}" for i in range(3)],
        "commit": ["c"] * 3, "lang": ["de"] * 3,
        "content": [d[0] for d in docs],
        "body_de": [d[1] for d in docs],
    }), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, analyzer="simple", num_buckets=2,
                hot_terms=frozenset(),
                extra_content_columns=(("body_de", "body_de", "german"),))
    s = IndexSearcher(idx, field_analyzers={"body_de": "german"})
    # query "Häusern" stems to "haus" == stem of "Haus"/"Häuser"
    ids, _ = s._eval({"kind": "match", "field": "body_de", "text": "Häusern"})
    assert set(ids) == {0, 1}
    ids, _ = s._eval({"kind": "match", "field": "body_de", "text": "Garten"})
    assert list(ids) == [2]


def test_cjk_bigram_analyzer():
    """CJKAnalyzer semantics: width fold, script-run bigrams with
    overlapping positions, lone-char unigram, English stop filter on the
    Latin side."""
    from elasticsearch_ray.analyzer import get_analyzer

    an = get_analyzer("cjk")
    assert an.positions("Data 漢字情報 x 字") == [
        ("data", 0), ("漢字", 1), ("字情", 2), ("情報", 3), ("x", 4),
        ("字", 5)]
    # fullwidth Latin + ideographic space fold to ASCII before tokenizing
    assert an("ＦＵＬＬ　ｗｉｄｔｈ") == ["full", "width"]
    # hiragana/katakana/hangul runs bigram too; script boundary breaks runs
    assert an("これはテスト") == ["これ", "れは", "はテ", "テス", "スト"]
    assert an("한국어") == ["한국", "국어"]
    # stopword 'the' removed but occupies a position (gap)
    assert an.positions("the 漢字") == [("漢字", 1)]


def test_persian_analyzer_normalization():
    """PersianAnalyzer: ZWNJ -> space, arabic kaf/yeh -> keheh/farsi yeh,
    teh marbuta -> heh, tatweel + diacritics stripped, stop filter with
    position gaps, no stemmer."""
    from elasticsearch_ray.analyzer import get_analyzer

    an = get_analyzer("persian")
    # arabic kaf U+0643 + tatweel U+0640 -> keheh U+06A9, tatweel gone
    assert an("كـتاب") == ["کتاب"]
    # arabic yeh U+064A -> farsi yeh U+06CC
    assert an("علي") == ["علی"]
    # teh marbuta U+0629 -> heh U+0647
    assert an("مدرسة") == [
        "مدرسه"]
    # ZWNJ compound splits into two tokens
    assert len(an("کتاب‌ها")) == 2
    # stopword 'va' removed with a position gap
    toks = an.positions("کتاب و قلم")
    assert toks == [("کتاب", 0),
                    ("قلم", 2)]
    # diacritics (harakat) stripped
    assert an("بَد") == ["بد"]


# --------- round-3c language additions (Snowball ro/fi + light stemmers) ---------

from elasticsearch_ray.lang.analyzers import STEMMERS  # noqa: E402
from elasticsearch_ray.lang.light import (  # noqa: E402
    greek_fold,
    hindi_normalize,
    sorani_normalize,
    turkish_lower,
)

GOLDEN_3C = {
    "romanian": [
        ("copiii", "copii"), ("caselor", "cas"), ("frumoasă", "frumoas"),
        ("lucrurile", "lucrur"), ("naţionale", "naţional"),
        ("abilitate", "abil"), ("jucau", "juc"),
    ],
    "finnish": [
        ("taloissa", "talo"), ("lapset", "laps"), ("kirjoissa", "kirj"),
        ("mahdollisuuksien", "mahdollisuuks"), ("kauniissa", "kaun"),
        ("suurimmat", "suurim"),
    ],
    "hungarian": [
        ("házakban", "haz"), ("gyerekek", "gyerek"),
        ("lehetőségekkel", "lehetoseg"), ("szépen", "szep"),
        ("játszottak", "jatszott"),
    ],
    "turkish": [
        ("evlerinde", "evler"), ("kitaplarımız", "kitap"),
        ("çocukların", "çocuk"), ("okullarda", "okul"),
        ("arkadaşlarımla", "arkadaş"),
    ],
    "greek": [
        ("παιδιά", "παιδι"), ("σπίτια", "σπιτι"),
        ("δυνατότητες", "δυνατοτητ"), ("όμορφους", "ομορφ"),
        ("βιβλίο", "βιβλι"),
    ],
    "hindi": [
        ("लड़कियों", "लडक"), ("किताबें", "किताब"), ("खेलती", "खेल"),
        ("बच्चों", "बच्च"), ("संभावनाओं", "संभावन"),
    ],
    "czech": [
        ("dětech", "dět"), ("knihami", "knih"), ("možnostech", "možnost"),
        ("velkých", "velk"), ("domech", "dom"),
    ],
    "bulgarian": [
        ("децата", "дец"), ("книгите", "книг"),
        ("възможностите", "възможност"), ("голямото", "голям"),
        ("къщите", "къщ"),
    ],
    "latvian": [
        ("bērniem", "bērn"), ("grāmatās", "grāmat"), ("iespējām", "iespēj"),
        ("skaistajiem", "skaist"), ("mājās", "māj"),
    ],
    "indonesian": [
        ("membacakan", "baca"), ("bukunya", "buku"),
        ("kemungkinannya", "mungkin"), ("bermain", "main"),
        ("makanan", "makan"),
    ],
    "sorani": [
        ("کتێبەکان", "کتێب"), ("منداڵەکانی", "منداڵ"),
        ("قوتابخانەکە", "قوتابخان"),
    ],
    "brazilian": [
        ("crianças", "crianc"), ("brincavam", "brinc"),
        ("possibilidades", "possibil"),
    ],
}


@pytest.mark.parametrize("lang", sorted(GOLDEN_3C))
def test_round3c_golden_vectors(lang):
    stem = STEMMERS[lang]
    for word, expected in GOLDEN_3C[lang]:
        assert stem(word) == expected, f"{lang}: {word}"


@pytest.mark.parametrize("lang,variants", [
    ("romanian", ["casă", "caselor", "casele"]),
    ("finnish", ["talo", "taloissa", "talon"]),
    ("hungarian", ["ház", "házakban", "házak"]),
    ("turkish", ["kitap", "kitaplar", "kitaplarımız"]),
    ("czech", ["kniha", "knihami"]),
    ("bulgarian", ["книга", "книгите", "книгата"]),
    ("latvian", ["māja", "mājās"]),
    ("indonesian", ["baca", "membacakan", "membaca"]),
])
def test_round3c_variants_share_stem(lang, variants):
    stems = {STEMMERS[lang](v) for v in variants}
    assert len(stems) == 1, f"{lang}: {variants} -> {stems}"


def test_turkish_lowercase_and_apostrophe():
    assert turkish_lower("İSTANBUL KIRMIZI") == "istanbul kırmızı"
    tr = get_analyzer("turkish")
    # ApostropheFilter: the suffix after ' never becomes a token
    assert tr("İstanbul'da yaşıyor") == tr("İstanbul yaşıyor")


def test_greek_fold_final_sigma_and_tonos():
    assert greek_fold("ΔΥΝΑΤΌΤΗΤΕΣ") == "δυνατοτητεσ"
    assert greek_fold("πόλης") == "πολησ"


def test_hindi_normalizer_nukta_and_zwj():
    assert hindi_normalize("क़िताब") == "किताब"
    assert hindi_normalize("लड़की") == "लडकी"


def test_sorani_normalizer_arabic_letters():
    assert sorani_normalize("كتيب") == "کتیب"


def test_devanagari_tokens_keep_matras():
    hi = get_analyzer("hindi")
    toks = hi("बच्चे खेलते")
    # combining matras must not split words (Python \w excludes marks)
    assert toks == ["बच्च", "खेल"]


def test_round3c_analyzer_chain_stops_and_stems():
    ro = get_analyzer("romanian")
    assert ro("Copiii se jucau în casele frumoase") == \
        ["copii", "juc", "cas", "frumoas"]
    fi = get_analyzer("finnish")
    assert fi("Lapset leikkivät kauniissa taloissa") == \
        ["laps", "leikkiv", "kaun", "talo"]


# ----- round-3d: the final ten of the reference's 35 language analyzers -----

GOLDEN_3D = {
    "armenian": [
        ("երեխաները", "երեխա"), ("երեխան", "երեխա"), ("տուն", "տուն"),
        ("քաղաքում", "քաղաք"), ("հնարավորություններով", "հնարավորություն"),
    ],
    "basque": [
        ("etxeetan", "etxe"), ("liburuaren", "liburu"),
        ("aukerekin", "auker"), ("haurrek", "haurr"),
    ],
    "bengali": [
        ("বাচ্চারা", "বাচ্চা"), ("বইগুলি", "বই"), ("শহরের", "শহর"),
        ("সম্ভাবনার", "সম্ভাবনা"),
    ],
    "catalan": [
        ("cases", "cas"), ("jugaven", "jug"), ("possibilitats", "possibil"),
        ("nacionals", "nacional"), ("cançons", "cançon"),
    ],
    "estonian": [
        ("majades", "maja"), ("lapsed", "lapse"),
        ("võimalustega", "võimalus"), ("raamatutes", "raamatu"),
    ],
    "galician": [
        ("nacionais", "nacional"), ("posibilidades", "posibil"),
        ("xogaban", "xog"), ("libros", "libr"),
    ],
    "irish": [
        ("bhfuil", "fuil"), ("n-athair", "athair"), ("tsráid", "sráid"),
        ("páistí", "páist"), ("tithe", "tith"),
    ],
    "lithuanian": [
        ("namuose", "nam"), ("vaikai", "vaik"), ("galimybėmis", "galimyb"),
        ("knygose", "knyg"),
    ],
}


@pytest.mark.parametrize("lang", sorted(GOLDEN_3D))
def test_round3d_golden_vectors(lang):
    stem = STEMMERS[lang]
    for word, expected in GOLDEN_3D[lang]:
        assert stem(word) == expected, f"{lang}: {word}"


@pytest.mark.parametrize("lang,variants", [
    ("armenian", ["երեխա", "երեխաները", "երեխային", "երեխան"]),
    ("basque", ["etxe", "etxeetan", "etxea"]),
    ("bengali", ["বই", "বইগুলি"]),
    ("catalan", ["casa", "cases"]),
    ("estonian", ["maja", "majades"]),
    ("galician", ["canción", "cancións"]),
    ("irish", ["páiste", "páistí"]),
    ("lithuanian", ["namas", "namuose"]),
])
def test_round3d_variants_share_stem(lang, variants):
    stems = {STEMMERS[lang](v) for v in variants}
    assert len(stems) == 1, f"{lang}: {variants} -> {stems}"


def test_bengali_normalizer_and_matras():
    from elasticsearch_ray.lang.light import bengali_normalize
    # nukta decomposition: ড় -> ড, য় -> য
    assert bengali_normalize("বাড়ি") == "বাডি"
    bn = get_analyzer("bengali")
    # Bengali combining matras must not split words
    assert bn("সুন্দর বাড়ি") == ["সুন্দ", "বাডি"]


def test_chinese_standard_semantics():
    zh = get_analyzer("chinese")
    # StandardAnalyzer: one token per Han ideograph; english stop set
    # applies to latin spans
    assert zh("北京 the city") == ["北", "京", "city"]


def test_thai_script_runs_and_stops():
    th = get_analyzer("thai")
    # script-run tokenization; Thai stop words (ที่ การ ...) removed;
    # latin spans lowercase through the standard path
    assert th("ที่ บ้าน Big") == ["บ้าน", "big"]


def test_irish_mutations_do_not_overfire():
    stem = STEMMERS["irish"]
    # plain words beginning t/n + vowel are NOT mutation-stripped
    assert stem("nead")[0] == "n"
    assert stem("tithe")[0] == "t"


def test_rslp_brazilian_goldens():
    """RSLP examples from the Orengo & Huyck 2001 rule families: plural,
    feminine, adverb, augmentative/diminutive, noun, verb, vowel, and the
    full-word exception lists."""
    from elasticsearch_ray.lang.light import brazilian_stem as b

    assert b("meninas") == "menin"        # plural s + vowel
    assert b("balões") == "bal"           # ões->ão, then augment ão
    assert b("bons") == "bom"             # ns->m
    assert b("normais") == "norm"         # ais->al, then noun al
    assert b("papéis") == "papel"         # éis->el
    assert b("lápis") == "lapis"          # plural exception (accent strip)
    assert b("chilena") == "chilen"       # feminine na->no + vowel
    assert b("americana") == "americ"     # na->no, then noun ano
    assert b("inglesa") == "ingl"         # esa->ês, noun ês
    assert b("rapidamente") == "rapid"    # adverb mente + vowel
    assert b("experimente") == "experim"  # -mente exception; noun ente
    assert b("casinha") == "cas"          # feminine inha->inho, aug inho
    assert b("caminho") == "caminh"       # augment exception + vowel
    assert b("grandão") == "grand"        # augment ão
    assert b("coração") == "coraca"       # ão exception, vowel+accents
    assert b("possibilidades") == "possibil"  # plural + noun idade
    assert b("organizadoras") == "organiz"    # plural, ora->or, noun ador
    assert b("brincavam") == "brinc"      # verb avam
    assert b("cantando") == "cant"        # verb ando
    assert b("menino") == "menin"         # vowel removal
