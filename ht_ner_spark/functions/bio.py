"""AR1-AR4: BIO tag machinery as index-aware array transforms (SURVEY §2.8).

Reference: /root/reference/src/dataset.py:823-855 (toBIO/fixBIO/toIO) and
:121-155 (label projection map_fn). All pure within-row higher-order
functions — narrow, codegen'd, no shuffle.

Index convention: F.transform's lambda index is 0-based; element_at is
1-based, so the previous element of position i is element_at(tags, i) —
element_at(tags, 0) is invalid, guarded by the i == 0 branch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_bio(tags: Column) -> Column:
    """toBIO (dataset.py:823-834): first tag of a run of identical non-O tags
    -> 'B-x', continuations -> 'I-x'. Input tags are bare class names
    ('O', 'NAME', ...)."""
    return F.transform(
        tags,
        lambda t, i: F.when(t == "O", F.lit("O"))
        .when((i == 0) | (F.element_at(tags, i) != t), F.concat(F.lit("B-"), t))
        .otherwise(F.concat(F.lit("I-"), t)),
    )


def fix_bio(tags: Column) -> Column:
    """fixBIO (dataset.py:837-849), quirks preserved exactly:
    * the run test compares FULL raw tags (``x[i-1] != x[i]``), so an 'I-x'
      following 'B-x' is itself rewritten to 'B-x' — only an 'I-x' after an
      identical 'I-x' survives;
    * the repair is ``replace('I-', 'B-')`` (substring replace, anywhere)."""
    def fix(t, i):
        prev = F.element_at(tags, i)  # 1-based -> the element before pos i
        repaired = F.replace(t, F.lit("I-"), F.lit("B-"))
        return (
            F.when(t == "O", F.lit("O"))
            .when(i == 0, repaired)
            .when((prev != t) & ~t.contains("B-"), repaired)
            .otherwise(t)
        )

    return F.transform(tags, fix)


def to_io(tags: Column) -> Column:
    """toIO (dataset.py:852-855), quirk preserved: 'I-' is PREPENDED verbatim
    (a BIO input 'B-x' becomes 'I-B-x'; intended input is bare class names)."""
    return F.transform(
        tags,
        lambda t: F.when(t == "O", F.lit("O")).otherwise(F.concat(F.lit("I-"), t)),
    )


def project_label(tags: Column, keep_substr: str, out_class: str) -> Column:
    """map_fn (dataset.py:121-155): collapse a many-class BIO vocabulary to a
    binary-class one — tags whose lower-cased name contains keep_substr keep
    their B-/I- prefix re-targeted at out_class; everything else -> 'O'."""
    return F.transform(
        tags,
        lambda t: F.when(
            F.instr(F.lower(t), keep_substr.lower()) > 0,
            # reference checks '"I-" in ll' (substring anywhere, :127/:136)
            F.when(t.contains("I-"), F.lit(f"I-{out_class}")).otherwise(
                F.lit(f"B-{out_class}")
            ),
        ).otherwise(F.lit("O")),
    )
