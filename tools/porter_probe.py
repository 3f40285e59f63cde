#!/usr/bin/env python3
"""Independent Porter-stemmer cross-check (round-13 VERDICT directive 4).

Diffs the engine's `Porter.stem` outputs (a TSV dumped by
`graft.tools.StemDump`: term<TAB>engine_stem per line) against a
pure-Python Porter implemented HERE, directly from the published
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
14(3), 1980) — no code shared with the Scala engine. This closes the
one self-referential input of the x03/x04 oracle: OracleAnalyzer's
stem map is rendered FROM `Porter.stem`, so a Porter bug could not
fail that compare; it fails this one.

Faithfulness notes (the points where the paper leaves room and the
canonical reference implementation fixes the reading):
 - Rule selection within a step is by LONGEST matching S1; if that
   rule's condition fails, NO rule in the step fires ("only one is
   obeyed, and this will be the one with the longest matching S1").
   There is no fall-through to a shorter suffix.
 - Words of length <= 2 are left untouched (canonical impl: k <= 1).
 - Any character that is not a/e/i/o/u (or a 'y' preceded by a
   non-consonant) counts as a consonant — digits and apostrophes from
   the corpus tokenizer therefore behave as consonants.

usage: porter_probe.py <dump.tsv> [--mutate]
  --mutate  deliberately perturb the ENGINE column (every 10th stem
            gets a step-1a-style trailing 's' restored) before
            diffing, to demonstrate the probe actually fires on an
            engine bug regardless of the corpus's suffix mix.
exit 0 on zero mismatches, 1 otherwise; prints up to 20 diffs.
"""
import sys

VOWELS = set("aeiou")


def _cons(w, i):
    c = w[i]
    if c in VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _m(w):
    """Measure: m in [C](VC)^m[V] over the whole string w."""
    n, i, L = 0, 0, len(w)
    while i < L and _cons(w, i):
        i += 1
    while i < L:
        while i < L and not _cons(w, i):
            i += 1
        if i < L:
            n += 1
            while i < L and _cons(w, i):
                i += 1
    return n


def _has_vowel(w):
    return any(not _cons(w, i) for i in range(len(w)))


def _dd(w):  # *d — ends with a double consonant
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w):  # *o — ends cvc, final c not w/x/y
    return (
        len(w) >= 3
        and _cons(w, len(w) - 3)
        and not _cons(w, len(w) - 2)
        and _cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _apply_longest(w, rules, cond):
    """Longest matching S1 wins; its condition failing ends the step."""
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is None:
        return w
    suf, rep = best
    stem = w[: len(w) - len(suf)]
    return stem + rep if cond(stem, suf) else w


STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter(word):
    if word is None or len(word) <= 2:
        return word
    w = word.lower()

    # Step 1a — longest match among sses/ies/ss/s, unconditional.
    w = _apply_longest(
        w, [("sses", "ss"), ("ies", "i"), ("ss", "ss"), ("s", "")],
        lambda stem, suf: True)

    # Step 1b. "eed" is the longest match when present: its condition
    # failing means the step's first block does nothing (no ED rule).
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    else:
        stripped = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stripped = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stripped = w[:-3]
        if stripped is not None:
            if stripped.endswith(("at", "bl", "iz")):
                w = stripped + "e"
            elif _dd(stripped) and stripped[-1] not in "lsz":
                w = stripped[:-1]
            elif _m(stripped) == 1 and _cvc(stripped):
                w = stripped + "e"
            else:
                w = stripped

    # Step 1c.
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Steps 2 and 3: condition m(stem) > 0 on the longest match only.
    w = _apply_longest(w, STEP2, lambda stem, suf: _m(stem) > 0)
    w = _apply_longest(w, STEP3, lambda stem, suf: _m(stem) > 0)

    # Step 4: m(stem) > 1; ION additionally needs stem ending s/t.
    w = _apply_longest(
        w, [(s, "") for s in STEP4],
        lambda stem, suf: _m(stem) > 1
        and (suf != "ion" or (stem != "" and stem[-1] in "st")))

    # Step 5a.
    if w.endswith("e"):
        stem = w[:-1]
        a = _m(stem)
        if a > 1 or (a == 1 and not _cvc(stem)):
            w = stem

    # Step 5b.
    if w.endswith("ll") and _m(w) > 1:
        w = w[:-1]
    return w


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    mutate = "--mutate" in sys.argv[2:]
    pairs = []
    with open(sys.argv[1], encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            term, engine = line.split("\t")
            if mutate and len(pairs) % 10 == 0:
                engine += "s"  # simulated engine bug
            pairs.append((term, engine))
    bad = [(t, e, porter(t)) for t, e in pairs if porter(t) != e]
    for t, e, p in bad[:20]:
        print(f"MISMATCH {t!r}: engine={e!r} paper={p!r}")
    print(f"porter probe: {len(pairs)} terms, {len(bad)} mismatches"
          + (" [mutated engine column]" if mutate else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
