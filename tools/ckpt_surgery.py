"""Teacher→student init checkpoint surgery (L8 tooling).

Reference: /root/reference/ckpt.py:1-22 — loads the LiDAR teacher .pth and
duplicates every weight under a `radar_`-prefixed key so the student branch
starts from the LiDAR weights (pillarnet_fullset_lidar.pth →
pillarnet_fullset_init.pth).

TPU-native: operate on the orbax checkpoint's param pytree via
train.checkpoint.duplicate_teacher_to_radar (scope-level copy with
shape-compatible overlay — the radar VFE's first linear keeps its fresh init
since radar has 6 raw point features vs lidar's 5).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="teacher checkpoint dir")
    parser.add_argument("--dst", required=True, help="output init checkpoint dir")
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    from radardistill_tpu.train.checkpoint import duplicate_teacher_to_radar

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(Path(args.src).absolute())
    payload["state"]["params"] = duplicate_teacher_to_radar(payload["state"]["params"])
    if "batch_stats" in payload["state"]:
        payload["state"]["batch_stats"] = duplicate_teacher_to_radar(
            payload["state"]["batch_stats"]
        )
    ckptr.save(Path(args.dst).absolute(), payload)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
