"""Python UDTF surface (Spark 4, Arrow-optimized).

The reference defines no UDFs at all (SURVEY §2.11); this engine keeps
every hot path in built-in functions. The UDTF here completes the
demonstrated Python-boundary matrix — scalar pandas_udf
(operators/vectorized.py), grouped-map mapInPandas
(operators/multimodal.py), stateful applyInPandasWithState
(streaming/stateful.py), Python DataSource (sources/cdc_generator.py) —
with the table-function shape, for operators whose natural output is a
variable number of rows per input row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk string, n_tokens int", useArrow=True)
class ChunkText:
    """Fixed-size token chunker: one input document → ⌈n/size⌉ chunk
    rows. The built-in twin (corpus_pack_sequences) packs greedily
    JVM-side; this one demonstrates the lateral-UDTF shape where chunk
    logic needs real Python (a tokenizer library, in production)."""

    def eval(self, text: str, size: int):
        toks = text.split(" ")
        for i in range(0, len(toks), size):
            yield i // size, " ".join(toks[i : i + size]), min(size, len(toks) - i)
