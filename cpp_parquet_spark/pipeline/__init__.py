"""Training-data pipeline operators over the engine's tables.

Beyond the reference's encoder operators, these are the operations a
large-scale training-data pipeline needs (task brief): deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search, text analysis (language id, quality scoring, token
counting, fingerprinting) and multimodal column plumbing.  All are
DataFrame-first; Python appears only inside vectorized pandas/Arrow
UDFs.
"""
