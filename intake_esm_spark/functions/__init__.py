"""Scalar/column function library: text analysis, embeddings, multimodal plumbing."""
