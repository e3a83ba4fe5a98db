"""python -m nerfshop_tpu.viewer --scene <path> [--snapshot snap.ingp]"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="")
    p.add_argument("--snapshot", default="")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--train", action="store_true", help="train while serving")
    args = p.parse_args()

    from nerfshop_tpu import Testbed, TestbedMode
    from nerfshop_tpu.viewer import serve

    tb = Testbed(TestbedMode.Nerf)
    if args.snapshot:
        tb.load_snapshot(args.snapshot)
    if args.scene:
        tb.load_training_data(args.scene)
    serve(tb, args.port)


if __name__ == "__main__":
    main()
