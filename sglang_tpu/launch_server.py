"""Server launcher: ``python -m sglang_tpu.launch_server --model-path …``.

Equivalent role to the reference's ``python/sglang/launch_server.py`` +
``cli/serve.py``.
"""

from __future__ import annotations

import argparse

from sglang_tpu.server_args import ServerArgs


def main(argv=None):
    parser = argparse.ArgumentParser(description="sglang-tpu serving engine")
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args(argv)
    server_args = ServerArgs.from_cli_args(args)

    from sglang_tpu.entrypoints.http_server import launch_server

    launch_server(server_args)


if __name__ == "__main__":
    main()
