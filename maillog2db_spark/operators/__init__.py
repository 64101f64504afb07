"""Extended operator library: relational analytics, event windows,
dedup, similarity search, text analysis, multimodal plumbing."""
