"""``python -m sglang_tpu serve --model-path …`` — CLI dispatcher.

Equivalent role to the reference's ``cli/main.py`` (the ``sglang``
command: serve / generate / version).
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cmd = argv[0] if argv else "help"
    if cmd == "serve":
        from sglang_tpu.launch_server import main as serve_main

        serve_main(argv[1:])
    elif cmd == "version":
        import sglang_tpu

        print(sglang_tpu.__version__)
    else:
        print(
            "usage: python -m sglang_tpu {serve,version} [--help]\n"
            "  serve    launch the HTTP serving engine\n"
            "  version  print the package version"
        )
        if cmd not in ("help", "-h", "--help"):
            sys.exit(2)


if __name__ == "__main__":
    main()
