"""Hashing-trick linear quality classifier kernels (pure Python).

The model-based curation filter (GPT-3 appx A / LLaMA "quality
classifier" step; fastText-style linear model, Joulin+ 2016): tokens
hash into 2^16 feature buckets, a weight per bucket, document score =
sum of instance weights, keep iff the mean weight is positive.

No model downloads exist in this sandbox, so the DEFAULT weight table
is a deterministic md5-derived stand-in (the repo's mock-model policy —
the plumbing, hashing and thresholding are the real operator; a trained
model drops in as a weights array).  All arithmetic is integer
micro-logits so the oracle needs no float discipline:

- bucket(token)  = int(md5(token)[:4], 16)            (16-bit bucket)
- weight(bucket) = int(md5("w" + str(bucket))[:8], 16) % 2001 - 1000
- doc logit_sum  = sum over token INSTANCES of weight(bucket)
- keep           = logit_sum > 0                      (mean > 0)
"""
from __future__ import annotations

import hashlib

N_BUCKETS = 1 << 16


def token_bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:4], 16)


def default_weight(bucket: int) -> int:
    h = hashlib.md5(("w" + str(bucket)).encode()).hexdigest()
    return int(h[:8], 16) % 2001 - 1000


def doc_logit(tokens: list[str], weights=None,
              _memo: dict | None = None) -> tuple[int, int]:
    """(n_tokens, logit_sum) for one document; ``weights`` is an optional
    dense array indexed by bucket (a trained model), else the
    deterministic default.  ``_memo`` caches token→weight per worker."""
    total = 0
    memo = _memo if _memo is not None else {}
    for t in tokens:
        w = memo.get(t)
        if w is None:
            b = token_bucket(t)
            w = int(weights[b]) if weights is not None else default_weight(b)
            memo[t] = w
        total += w
    return len(tokens), total
