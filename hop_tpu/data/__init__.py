"""Host-side data pipeline: record store, vocab, preprocessing, batching."""
