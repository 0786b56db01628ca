#!/usr/bin/env python
"""(Re)generate the committed pre-trained model artifacts under
data/models (S5 surface). Run after any change to ml/pipeline.py's
FEATURES, hyperparameters, or the materials corpus:

    python scripts/train_models.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from oxi_diel_db_spark.ml import pipeline as P
    from oxi_diel_db_spark.session import get_spark
    from oxi_diel_db_spark.sources import materials as M

    spark = get_spark("train_models")
    for which in ("el",):
        model, feats = P.train(M.materials(spark), which=which, seed=42)
        path = os.path.join(P.REPO_MODELS_DIR, f"rf_{which}_seed42")
        model.write().overwrite().save(path)
        n = feats.count()
        print(f"saved {path} (trained on {n} rows)")


if __name__ == "__main__":
    main()
