from sparkcheck.similarity.ann import cosine_topk_bruteforce, cosine_topk_bucketed
from sparkcheck.similarity.ivf import ivf_topk, train_centroids
from sparkcheck.similarity.kmeans import (
    centroids_frame,
    kmeans_assign,
    kmeans_cluster,
    kmeans_fit,
)

__all__ = [
    "cosine_topk_bruteforce",
    "cosine_topk_bucketed",
    "ivf_topk",
    "train_centroids",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_cluster",
    "centroids_frame",
]
