"""Synthetic fixtures per FIXTURES.md (seeded, reproducible)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def gbsg2_like(n: int = 686, seed: int = 42) -> pd.DataFrame:
    """F2: shape of lifelines' GBSG2 (used by every reference model test)."""
    rng = np.random.default_rng(seed)
    age = rng.integers(21, 81, n)
    tsize = rng.integers(3, 121, n)
    pnodes = 1 + rng.poisson(4, n)
    progrec = np.floor(rng.lognormal(3, 1.5, n)).astype(int)
    estrec = np.floor(rng.lognormal(3, 1.3, n)).astype(int)
    horth = rng.choice(["no", "yes"], n)
    meno = rng.choice(["Pre", "Post"], n)
    tgrade = rng.choice(["I", "II", "III"], n, p=[0.2, 0.6, 0.2])
    # survival times correlated with pnodes/tsize so c_index > 0.5 is learnable
    risk = 0.04 * pnodes + 0.01 * tsize + 0.3 * (tgrade == "III")
    time = np.ceil(rng.weibull(1.3, n) * 900 * np.exp(-risk)).astype(int) + 8
    cens = rng.binomial(1, 0.55, n)
    return pd.DataFrame(
        {
            "time": time,
            "cens": cens,
            "age": age,
            "estrec": estrec,
            "horTh": horth,
            "menostat": meno,
            "pnodes": pnodes,
            "progrec": progrec,
            "tgrade": tgrade,
            "tsize": tsize,
        }
    )


def churn_like(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    """F3: shape of the pysurvival churn dataset (README end-to-end slice)."""
    rng = np.random.default_rng(seed)
    product = rng.choice(["basic", "plus", "premium"], n)
    csat = np.round(rng.uniform(0, 10, n), 1)
    articles = rng.poisson(5, n).astype(float)
    notifications = rng.poisson(10, n).astype(float)
    emails = rng.poisson(3, n).astype(float)
    ads = rng.poisson(7, n).astype(float)
    support = np.round(rng.exponential(8, n), 2)
    risk = -0.15 * csat + 0.03 * support - 0.2 * (product == "premium")
    months = np.round(rng.weibull(1.2, n) * 24 * np.exp(-risk), 1) + 0.1
    churned = rng.binomial(1, 0.5, n)
    return pd.DataFrame(
        {
            "months_active": months,
            "churned": churned,
            "product_purchased": product,
            "csat_score": csat,
            "articles_viewed": articles,
            "smartphone_notifications_viewed": notifications,
            "marketing_emails_clicked": emails,
            "social_media_ads_viewed": ads,
            "minutes_customer_support": support,
        }
    )
