"""(Re)generate the committed demo-model artifact (lingvo_spark_kg/model/
demo_weights.npz): deterministic training, so the output is bit-stable for a given
model/demo.py DEMO_VERSION. Usage: python tools/make_demo_models.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from lingvo_spark_kg.model.demo import save_demo_models, train_demo_models  # noqa: E402


def main() -> None:
    t0 = time.time()
    pos_m, ner_m = train_demo_models()
    path = save_demo_models(pos_m, ner_m)
    print(f"wrote {path} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
