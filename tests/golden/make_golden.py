"""Regenerate the committed golden token table for the
`analyze_standard_tokens` driver query.

The golden freezes the OUTPUT of the standard analyzer (UAX#29 +
lowercase + asciifolding preserve_original, analysis.py) over the
deterministic non-ASCII corpus built by entrypoints._std_corpus at
sf0.01.  It is a regression oracle: the driver's DuckDB side reads this
file, so any change to the analyzer's segmentation/folding/stacking
behavior breaks the value hash and must be accompanied by a reviewed
regeneration (python tests/golden/make_golden.py).
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    from search_ingest_spark.entrypoints import _GOLDEN_STD_TOKENS, _std_corpus
    from search_ingest_spark.query.bm25 import doc_terms
    from search_ingest_spark.session import get_spark

    spark = get_spark("make-golden", master="local[8]", shuffle_partitions=8)
    out = doc_terms(_std_corpus(spark, "/root/testdata/sf0.01"), mode="standard")
    pdf = out.toPandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, _GOLDEN_STD_TOKENS)
    print(f"wrote {len(pdf)} rows -> {_GOLDEN_STD_TOKENS}")


if __name__ == "__main__":
    main()
