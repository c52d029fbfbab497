"""bigdataentityresolution_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the capabilities of the reference C engine
(meryfanou/BigDataEntityResolution, surveyed in SURVEY.md) as idiomatic
Spark DataFrame programs:

- blocking:   MinHash/LSH token-shingle blocking (reference: hash-bucket
              blocking, src/functs.c:1731-1806)
- scoring:    TF-IDF bag-of-words + vectorized similarity features +
              mini-batch logistic regression (reference: src/logistic.c)
- clustering: large-star/small-star iterative connected components
              (reference: clique merge union-find, src/myMatches.c:151-228)

Everything is DataFrame/SQL-first; Python only appears as Arrow-vectorized
pandas UDFs (never per-row Python UDFs).
"""

from bigdataentityresolution_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
