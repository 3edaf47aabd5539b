"""PySpark-native entity-resolution / record-linkage engine.

A from-scratch re-expression of the capabilities of the reference repo
``Hutaph/LAB02_Citation_Matching_and_Entity_Resolution`` (a single-process
pandas/sklearn citation-matching pipeline) as an idiomatic, horizontally
scalable Spark DataFrame pipeline:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      -> normalize (reference-parity text normalizer)
      -> assemble  (window-ordered per-conversation documents)
      -> blocking  (multi-pass keys + MinHash-LSH, skew capped)
      -> features  (vectorized pandas/Arrow UDF pair features)
      -> scoring   (rule score + Spark ML logistic match score)
      -> resolve   (greedy 1:1 reference parity) / clustering (connected components)
      -> metrics   (pairwise F1, MRR@5, throughput)

Everything is DataFrame-first: Catalyst handles pushdown/pruning/broadcast;
Python appears only inside Arrow-batched pandas UDFs (never per-row).
"""

from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
