#!/usr/bin/env python
"""Build the training manifest CSV + split JSON from preprocessing output.

The reference documents the manifest format (``/root/reference/README.md:104-136``:
columns ``case_id, features_filepath, label, clusters_filepath,
clusters_json_filepath``) but ships no tool that writes it — users are
expected to assemble it by hand. This closes that gap for the one-command
runbook (``scripts/run_camelyon.sh``): given the feature/cluster dirs
produced by ``wsi_processing/{extract_features,features_clustering}.py``
and a labels CSV (``case_id,label`` — for Camelyon16 the convention
``normal_* -> 0``, ``tumor_*/test_* per the challenge reference -> 1``),
it writes

- ``<out_dir>/<dataset>_<K>.csv`` — K is parsed from the filename stem's
  last ``_`` token by both trainers (``utils/datasets.py:138-140``), so the
  name is part of the contract;
- ``<out_dir>/<dataset>_split.json`` — ``{train, valid, test}`` case-id
  lists (``train_RLMIL.py:62-66``), label-stratified at --frac, seeded.

Slides missing any artifact (features npz, cluster npz, cluster json) are
reported and skipped, mirroring the preprocessing CLIs' per-slide
fault-tolerance.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feat_dir", required=True,
                    help="dir of per-slide feature .npz "
                         "(wsi_processing/extract_features.py --save_dir)")
    ap.add_argument("--cluster_dir", required=True,
                    help="dir of per-slide cluster .npz/.json "
                         "(features_clustering.py output)")
    ap.add_argument("--labels_csv", required=True,
                    help="CSV with case_id,label columns (header required)")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--dataset", default="camelyon16")
    ap.add_argument("--num_clusters", type=int, default=10,
                    help="K — must match features_clustering.py; becomes "
                         "the manifest filename suffix the loaders parse")
    ap.add_argument("--frac", type=str, default="0.6,0.15,0.25",
                    help="train,valid,test fractions (label-stratified)")
    ap.add_argument("--seed", type=int, default=985)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    labels = pd.read_csv(args.labels_csv)
    if not {"case_id", "label"} <= set(labels.columns):
        print(f"labels CSV needs case_id,label columns, got "
              f"{list(labels.columns)}", file=sys.stderr)
        return 2

    feat_dir, clus_dir = Path(args.feat_dir), Path(args.cluster_dir)
    rows, skipped = [], []
    for _, rec in labels.iterrows():
        cid = str(rec["case_id"])
        feat = feat_dir / f"{cid}.npz"
        cnpz = clus_dir / f"{cid}.npz"
        cjson = clus_dir / f"{cid}.json"
        if not (feat.exists() and cnpz.exists() and cjson.exists()):
            missing = [p.name for p in (feat, cnpz, cjson)
                       if not p.exists()]
            skipped.append((cid, missing))
            continue
        rows.append(dict(case_id=cid, features_filepath=str(feat),
                         label=int(rec["label"]),
                         clusters_filepath=str(cnpz),
                         clusters_json_filepath=str(cjson)))
    if skipped:
        for cid, missing in skipped:
            print(f"skip {cid}: missing {', '.join(missing)}",
                  file=sys.stderr)
    if not rows:
        print("no slide has all three artifacts — ran the preprocessing "
              "CLIs first?", file=sys.stderr)
        return 2

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(rows)
    csv_path = out_dir / f"{args.dataset}_{args.num_clusters}.csv"
    df.to_csv(csv_path, index=False)

    fr = [float(x) for x in args.frac.split(",")]
    assert len(fr) == 3 and abs(sum(fr) - 1.0) < 1e-6, \
        "--frac must be three fractions summing to 1"
    rng = np.random.default_rng(args.seed)
    split = {"train": [], "valid": [], "test": []}
    for _, grp in df.groupby("label"):
        ids = grp["case_id"].tolist()
        rng.shuffle(ids)
        n = len(ids)
        n_tr = max(1, round(n * fr[0]))
        n_va = max(1, round(n * fr[1]))
        split["train"] += ids[:n_tr]
        split["valid"] += ids[n_tr:n_tr + n_va]
        split["test"] += ids[n_tr + n_va:]
    for name, ids in split.items():
        if not ids:
            print(f"WARNING: {name} split is empty (too few slides for "
                  f"--frac {args.frac})", file=sys.stderr)
    split_path = out_dir / f"{args.dataset}_split.json"
    split_path.write_text(json.dumps(split, indent=2))

    print(json.dumps({
        "data_csv": str(csv_path), "data_split_json": str(split_path),
        "slides": len(df), "skipped": len(skipped),
        "split_sizes": {k: len(v) for k, v in split.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
