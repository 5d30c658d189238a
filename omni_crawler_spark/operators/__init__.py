"""Custom operators the reference lacks but a 100 TB training-data
pipeline needs: dedup families, similarity search, multimodal column
plumbing. Composition-of-builtins first; Arrow-batched pandas UDFs
only where built-ins genuinely can't express the op."""
