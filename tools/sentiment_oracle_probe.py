#!/usr/bin/env python3
"""Adversarial-corpus probe for the x01-x04 rendered oracles.

The driver's sf corpus is bland lowercase prose, so by itself it would
under-exercise the VADER rule engine. This probe writes a documents
table of adversarial texts -- ALL-CAPS emphasis, boosters at all three
window distances, plain/never-so/without-doubt negation, idioms
("the shit", "yeah right"), the "but" clause, !/? emphasis, emoticons,
least-damping, kind-of gating, whitespace/punctuation-only edge rows --
then the standard compare gates the SAME oracle SQL against the engine:

  python3 tools/sentiment_oracle_probe.py            # writes /tmp/tricky
  sbt -batch "runMain graft.tools.VerifySubset /tmp/tricky /tmp/vtricky \
      x01_vader_scores x02_sentiment_histogram x03_analyze_tokens x04_analyzed_search"
  python3 tools/check_oracle.py /tmp/tricky /tmp/vtricky

Round-12 result: 4 oracle-checked, 0 failures -- every double
bit-identical (see SCALING.md round 12).
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

TEXTS = [
    "The food here is good.",
    "The food here is GOOD!",
    "The food here is extremely good.",
    "The food here is not good.",
    "At least it isn't a horrible book.",
    "The book was only kind of good.",
    "The plot was good, but the characters are uncompelling and the dialog is not great.",
    "Today SUX!",
    "Today only kinda sux! But I'll get by, lol",
    "Make sure you :) or :D today!",
    "Not bad at all",
    "never so good", "never this good", "without doubt excellent",
    "the shit", "this is the bomb", "yeah right, great job",
    "VERY GOOD indeed!!", "good good good good", "bad!? bad?? bad!!!!",
    "least favorite thing", "at least it works", "very least good",
    "absolutely incredibly good", "hardly any good at all",
    "KIND of amazing", "kind of amazing",
    "I don't hate it, really!!!",
    "so so so great but terribly sad :(",
    "this was never so very this good",
    "What a handsome, smart and funny dude!",
    "   ", "!?!?", "a b c d e",
    "not very good at all, I think, but maybe ok?",
    "NOT GOOD but not terrible EITHER!!!",
]


def main(out_dir="/tmp/tricky"):
    os.makedirs(out_dir, exist_ok=True)
    t = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        "source": pa.array(["src0"] * len(TEXTS), pa.string()),
        "n_chars": pa.array([len(x) for x in TEXTS], pa.int64()),
    })
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))
    print(f"wrote {len(TEXTS)} adversarial docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main()
