"""Deploy-server CLI (ref: tools/deploy.py __main__)."""

from __future__ import annotations

import argparse
import sys

from advshadow_tpu.serve import DeployServer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="AdvShadow-TPU deploy server")
    p.add_argument("--host", type=str, default="localhost")
    p.add_argument("--port", type=int, default=12345)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    DeployServer(args.host, args.port).start()


if __name__ == "__main__":
    main(sys.argv[1:])
