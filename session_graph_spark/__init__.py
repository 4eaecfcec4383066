"""session_graph_spark — a from-scratch PySpark-native entity-resolution engine.

Re-implements the query and data-processing capabilities of the reference
``robertoshimizu/session-graph`` (a single-machine Python → RDF pipeline over
multi-platform AI coding transcripts) as an idiomatic Spark pipeline:

    turns table (conv_id, turn_idx, role, text, tool, ts)
      → deterministic mention extraction   (operators/extract.py)
      → two-level garbage filters          (functions/filters.py)
      → alias + slug normalization         (functions/normalize.py)
      → blocking (exact key + MinHash-LSH) (operators/blocking.py)
      → pairwise scoring (JW/Lev/Jaccard)  (operators/scoring.py)
      → connected components (large/small star) (operators/cc.py)
      → canonical entity clusters + query layer (plans/pipeline.py, queries.py)

Everything is DataFrame-first; Python only ever runs inside Arrow-batched
pandas UDFs (no per-row Python in the hot path).
"""

__version__ = "0.1.0"
