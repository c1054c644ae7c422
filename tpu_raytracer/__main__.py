"""`python -m tpu_raytracer` - the interactive app entry point (main.rs)."""

from .app import interactive
from .utils.config import parse_args


def main():
    cfg = parse_args()
    interactive.run(cfg)


if __name__ == "__main__":
    main()
