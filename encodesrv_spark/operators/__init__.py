# Set-oriented operators: dedup, similarity, multimodal, topk.
