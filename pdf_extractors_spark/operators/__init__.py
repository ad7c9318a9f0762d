"""Large-scale training-data operators beyond the reference's surface:
dedup, similarity search, text quality stats, multimodal column plumbing,
salted skew handling."""
