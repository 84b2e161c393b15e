"""Python UDTF surface (Spark 4): a table-function chunker.

The hot chunking path is pure JVM higher-order expressions
(llm/text.py:chunk_windows — sequence→slice→array_join fanned out by
posexplode); this module is the ESCAPE HATCH for chunkers the
expression language can't state (tokenizer-aware boundaries, sentence
splitting, markup-aware segmentation): a Python *user-defined table
function* invoked per input row via SQL ``LATERAL``, Arrow-optimized
(``useArrow=True`` → the plan shows ``ArrowEvalPythonUDTF``, batch
transfer — never the row-at-a-time ``BatchEvalPython`` path this repo
bans from its registry).

Reference parity: the reference has no table-function surface at all;
this extends the UDF story (SURVEY §2.10) with Spark 4's newest
Python API next to the custom Python data source (sources/cdclog.py).

Scale notes: a UDTF runs per-row inside each task — no shuffle is
introduced; the fan-out (one row in, n chunks out) happens inside the
Arrow batch exactly like posexplode.  The Python cost is why the
expression-based chunker stays the default; the UDTF exists so a
tokenizer-aware production chunker slots into the SAME query shape.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string", useArrow=True)
class ChunkWindowsUDTF:
    """Sliding context-window chunker: 1 text row → ceil((n-size)/
    stride)+1 chunk rows (min 1), the same boundary formula as
    llm/text.py:chunk_windows so either implementation can serve the
    same downstream schema."""

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        toks = text.split()
        n_chunks = max(-(-(len(toks) - size) // stride) + 1, 1)
        for i in range(n_chunks):
            yield i, " ".join(toks[i * stride : i * stride + size])


def register_chunker(spark, name: str = "chunk_windows_udtf") -> str:
    """Register the chunker UDTF on the session; returns the SQL name."""
    spark.udtf.register(name, ChunkWindowsUDTF)
    return name
