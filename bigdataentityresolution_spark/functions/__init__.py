"""Column-level function library (all JVM-side expressions unless noted).

Modules:
- text:       tokenization, shingling, portable string hash, text analytics
- hashes:     MinHash / SimHash / LSH band keys, reference hash1 compat
- similarity: cosine / jaccard / levenshtein feature columns + pandas UDFs
"""
