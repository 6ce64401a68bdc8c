"""Teacher-only evaluation (L7).

Reference: tools/test_teacher.py:101-609 — evaluates the frozen LiDAR
teacher with the pillarnet.yaml (lidar-only) config, loading --teacher_ckpt.
This wrapper reuses tools/test.py's machinery with the teacher config and a
teacher checkpoint.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, default="tools/cfgs/nuscenes_models/pillarnet.yaml")
    parser.add_argument("--teacher_ckpt", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--extra_tag", type=str, default="teacher")
    parser.add_argument("--platform", type=str, default=None)
    args, extra = parser.parse_known_args()

    sys.argv = [
        "test.py", "--cfg_file", args.cfg_file, "--ckpt", args.teacher_ckpt,
        "--batch_size", str(args.batch_size), "--extra_tag", args.extra_tag,
    ] + (["--platform", args.platform] if args.platform else []) + extra
    from tools import test as test_mod

    test_mod.main()


if __name__ == "__main__":
    main()
