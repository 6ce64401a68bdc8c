"""Pack the per-object GT-database crops into ONE flat array + offsets.

Reference: tools/process_tools/create_integrated_database.py:1-86 — reads
every `info['path']` .bin, concatenates into `<new_db_name>.npy`, and writes
`global_data_offset = (start, end)` back into the db-info pkl so the sampler
can slice one big array instead of opening thousands of tiny files
(database_sampler_distill.py:70-85 then serves it from shared memory).

This build extends it to the distill database: when infos carry
`radar_path` (paired lidar+radar crops, our info_gen.py), a second
`<new_db_name>_radar.npy` with `radar_global_data_offset` is produced.
The sampler consumes both via USE_SHARED_MEMORY + DB_DATA_PATH
(data/sampler.py: np.load(mmap_mode="r") — the host-side equivalent of
SharedArray: one page cache shared by all dataloader workers).
"""

import argparse
import copy
import os
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import numpy as np


def _pack(db_infos, root_path, path_key, offset_key, num_features):
    """Concatenate every crop under `path_key`; annotate offsets in-place."""
    start = 0
    chunks = []
    for category, class_infos in db_infos.items():
        print(f">>> packing {category} ({len(class_infos)} objects) [{path_key}]")
        for info in class_infos:
            if path_key not in info:
                continue
            pts = np.fromfile(
                str(root_path / info[path_key]), dtype=np.float32
            ).reshape(-1, num_features)
            n = len(pts)
            if path_key == "path" and n != info.get("num_points_in_gt", n):
                # reference fallback: some crops were written float64
                pts = np.fromfile(
                    str(root_path / info[path_key]), dtype=np.float64
                ).reshape(-1, num_features).astype(np.float32)
                n = len(pts)
                assert n == info["num_points_in_gt"], (info[path_key], n)
            info[offset_key] = (start, start + n)
            start += n
            chunks.append(pts)
    if not chunks:
        return None
    return np.concatenate(chunks)


def create_integrated_db_with_infos(args, root_path):
    with open(args.src_db_info, "rb") as f:
        db_infos = pickle.load(f)
    db_infos = copy.deepcopy(db_infos)

    global_db = _pack(db_infos, root_path, "path", "global_data_offset",
                      args.num_point_features)
    out_path = root_path / (args.new_db_name + ".npy")
    with open(out_path, "wb") as f:
        np.save(f, global_db)
    print(f"integrated database -> {out_path}")

    has_radar = any(
        "radar_path" in i for lst in db_infos.values() for i in lst
    )
    if has_radar:
        radar_db = _pack(db_infos, root_path, "radar_path",
                         "radar_global_data_offset", args.num_radar_features)
        radar_path = root_path / (args.new_db_name + "_radar.npy")
        with open(radar_path, "wb") as f:
            np.save(f, radar_db)
        print(f"integrated radar database -> {radar_path}")

    with open(args.src_db_info, "wb") as f:
        pickle.dump(db_infos, f)
    print(f"offsets written back -> {args.src_db_info}")
    return db_infos, global_db


def verify(info, whole_db, root_path, num_point_features):
    pts = np.fromfile(
        str(root_path / info["path"]), dtype=np.float32
    ).reshape(-1, num_point_features)
    s, e = info["global_data_offset"]
    assert np.array_equal(whole_db[s:e], pts)
    print("Verification pass!")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_db_info", type=str, required=True)
    parser.add_argument("--new_db_name", type=str,
                        default="nuscenes_gt_database_global")
    parser.add_argument("--num_point_features", type=int, default=5)
    parser.add_argument("--num_radar_features", type=int, default=6)
    parser.add_argument("--class_name", type=str, default="car",
                        help="category used for post-pack verification")
    args = parser.parse_args()

    root_path = Path(os.path.dirname(args.src_db_info))
    db_infos, whole_db = create_integrated_db_with_infos(args, root_path)
    if args.class_name in db_infos and db_infos[args.class_name]:
        verify(db_infos[args.class_name][0], whole_db, root_path,
               args.num_point_features)


if __name__ == "__main__":
    main()
