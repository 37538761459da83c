from sparkcheck.similarity.ann import cosine_topk_bruteforce, cosine_topk_bucketed

__all__ = ["cosine_topk_bruteforce", "cosine_topk_bucketed"]
