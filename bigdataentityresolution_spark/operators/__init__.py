"""Dataflow operators (DataFrame → DataFrame), one module per SURVEY.md §2 group.

- tfidf:      tokenize → tf/df/idf → top-k vocabulary → doc vectors (§2.4, §2.6)
- blocking:   MinHash/LSH blocking keys, salted candidate join, caps (§2.3)
- pairs:      labeled-pair resolution, isPair labeling semantics (§2.3)
- scoring:    mini-batch logistic regression + moving threshold (§2.9)
- clustering: large-star/small-star connected components, sinks (§2.7, §2.1)
- dedup:      exact/minhash/simhash/ngram/embedding dedup (pipeline extensions)
- ann:        brute-force + LSH-bucketed cosine top-k (pipeline extensions)
"""
