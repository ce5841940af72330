"""Data preparation CLI: GT-database creation + COM difficulty annotation.

Covers the reference's data-prep entry points: waymo_dataset.py --func
create_waymo_infos (GT database part), tools/demo_db.py (offline COM
annotator), and tools/process_tools/create_integrated_database.py (global
.npy consolidation).
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def create_gt_database(args, cfg):
    from com_tpu.data import build_dataloader

    dataset, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=True, workers=1
    )
    out = Path(args.out_dir or cfg.DATA_CONFIG.DATA_PATH)
    db_infos = dataset.create_groundtruth_database(out, used_classes=cfg.CLASS_NAMES)
    print("classes:", {k: len(v) for k, v in db_infos.items()})


def annotate_database(args, cfg):
    """Annotate an existing db-info pkl with occupancy/facade (demo_db role)."""
    from com_tpu.data.annotator import annotate_db_infos

    path = Path(args.db_info_path)
    with open(path, "rb") as f:
        db_infos = pickle.load(f)
    annotate_db_infos(db_infos, root_path=args.root_path or path.parent)
    out = path.with_name(path.stem + "_annotated.pkl")
    with open(out, "wb") as f:
        pickle.dump(db_infos, f)
    print("wrote", out)


def integrate_database(args, cfg):
    """Pack per-object .bin files into one global .npy + offsets
    (create_integrated_database.py:10-54 role)."""
    path = Path(args.db_info_path)
    root = Path(args.root_path or path.parent)
    with open(path, "rb") as f:
        db_infos = pickle.load(f)
    chunks = []
    offset = 0
    nfeat = args.num_point_features
    for infos in db_infos.values():
        for info in infos:
            pts = np.fromfile(str(root / info["path"]), dtype=np.float32).reshape(
                -1, nfeat
            )
            info["global_data_offset"] = (offset, offset + len(pts))
            offset += len(pts)
            chunks.append(pts)
    global_arr = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, nfeat))
    np.save(root / (path.stem + "_global.npy"), global_arr)
    with open(path.with_name(path.stem + "_integrated.pkl"), "wb") as f:
        pickle.dump(db_infos, f)
    print("wrote global array", global_arr.shape)


def create_pandaset_infos(args, cfg):
    """Build pandaset_infos_{train,val,test}.pkl + the train GT database from
    the devkit on-disk layout (reference pandaset_dataset.py:441-466),
    devkit-free (pandas + poses.json)."""
    from com_tpu.data.pandaset.pandaset_utils import \
        create_pandaset_infos as build

    # accept a model config (DATA_CONFIG nested) or the dataset config itself
    dc = cfg.get("DATA_CONFIG", cfg) if cfg is not None else {}
    root = Path(args.root_path or dc["DATA_PATH"])
    out = Path(args.out_dir or root)
    build(dc, cfg.get("CLASS_NAMES", []) if cfg is not None else [], root, out)


def create_waymo_infos(args, cfg):
    """Extract raw Waymo tfrecords into per-sequence info pkls + .npy point
    files (reference waymo_dataset.py --func create_waymo_infos; requires
    tensorflow + waymo-open-dataset)."""
    from pathlib import Path

    from com_tpu.data.waymo.waymo_utils import process_single_sequence

    root = Path(args.root_path)
    out = Path(args.out_dir or root / "waymo_processed_data")
    records = sorted(root.glob("*.tfrecord*"))
    if not records:
        print(f"no tfrecords under {root}")
        return
    all_infos = []
    for seq in records:
        all_infos.extend(
            process_single_sequence(
                seq, out, sampled_interval=args.sampled_interval,
                has_label=True,
            )
        )
    with open(out / "waymo_infos.pkl", "wb") as f:
        pickle.dump(all_infos, f)
    print(f"extracted {len(all_infos)} frames from {len(records)} sequences")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--func", required=True,
                        choices=["create_gt_database", "annotate_database",
                                 "integrate_database", "create_waymo_infos",
                                 "create_pandaset_infos"])
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--db_info_path", type=str, default=None)
    parser.add_argument("--root_path", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--num_point_features", type=int, default=5)
    parser.add_argument("--sampled_interval", type=int, default=1)
    args = parser.parse_args()

    cfg = None
    if args.cfg_file:
        from com_tpu.utils.config import CfgNode, cfg_from_yaml_file

        cfg = cfg_from_yaml_file(args.cfg_file, CfgNode())
    globals()[args.func](args, cfg)


if __name__ == "__main__":
    main()
