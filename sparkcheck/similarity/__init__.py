from sparkcheck.similarity.ann import cosine_topk_bruteforce, cosine_topk_bucketed
from sparkcheck.similarity.ivf import ivf_topk, train_centroids

__all__ = ["cosine_topk_bruteforce", "cosine_topk_bucketed", "ivf_topk", "train_centroids"]
