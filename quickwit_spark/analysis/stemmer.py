"""English Snowball stemmer (Porter2) — the `en_stem` analyzer's core.

The reference's `en_stem` tokenizer is SimpleTokenizer + RemoveLong +
LowerCaser + Stemmer(English) (`quickwit-query/src/tokenizers/
mod.rs:60-66`), where Stemmer(English) is the published Snowball
"english" (Porter2) algorithm. This is a from-scratch implementation of
that public specification (snowballstem.org/algorithms/english/stemmer.html).

Per-call memoization makes the batch path cheap: web-text token streams
have Zipfian vocabularies, so the stem of almost every token is a dict
hit; only distinct surface forms run the algorithm.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """(R1, R2) start offsets per the spec, with the gener-/commun-/
    arsen- prefix exception for R1."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """Short syllable at the END of the word: (a) non-vowel + vowel +
    non-vowel(not w/x/Y), or (b) vowel + non-vowel at position 0."""
    n = len(word)
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        if (
            c1 not in _VOWELS
            and v in _VOWELS
            and c2 not in _VOWELS
            and c2 not in "wxY"
        ):
            return True
    if n == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(word: str, upto: int) -> bool:
    return any(ch in _VOWELS for ch in word[:upto])


def _step2_map():
    return [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ]


def _step3_map():
    return [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]


_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def porter2_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    if len(word) <= 2:
        return word
    # mark consonant y as Y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _regions(word)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _has_vowel(word, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word.replace("Y", "y")

    # step 1b
    suffix = next(
        (s for s in ("eedly", "ingly", "edly", "ing", "eed", "ed") if word.endswith(s)),
        None,
    )
    if suffix in ("eed", "eedly"):
        if len(word) - len(suffix) >= r1:
            word = word[: len(word) - len(suffix)] + "ee"
    elif suffix is not None:
        stem = word[: len(word) - len(suffix)]
        if any(ch in _VOWELS for ch in stem):
            word = stem
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_DOUBLES):
                word = word[:-1]
            elif _is_short(word, r1):
                word += "e"

    # step 1c
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # step 2 (longest suffix; apply only if in R1)
    for suf, rep in _step2_map():
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: len(word) - len(suf)] + rep
            break

    # step 3 (longest suffix; in R1, 'ative' needs R2)
    for suf, rep in _step3_map():
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: len(word) - len(suf)]
                else:
                    word = word[: len(word) - len(suf)] + rep
            break

    # step 4 (longest suffix; in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= len(suf) + 1 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: len(word) - len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


def make_cached_stemmer():
    cache: dict[str, str] = {}

    def stem(tok: str) -> str:
        s = cache.get(tok)
        if s is None:
            s = porter2_stem(tok)
            cache[tok] = s
        return s

    return stem
