"""ht_ner_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of ComplexData-MILA/HT-NER.

Four-stage pipeline over an Iceberg-shaped source-code corpus
(repo, path, commit, lang, content):

  stage 1  mention detection   (gazetteer trie + regex LFs + batched scoring)
  stage 2  entity linking      (char-n-gram MinHash/LSH blocking + link scoring)
  stage 3  canonicalization    (large-star/small-star connected components)
  stage 4  triple materialization, partitioned by pred, with lineage + resume

Everything is DataFrame-first: built-in pyspark.sql.functions on the hot path,
Arrow-vectorized pandas UDFs only where relational ops can't express the
semantics (trie matching, model scoring).
"""

__version__ = "0.1.0"
