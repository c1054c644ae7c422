"""`python -m tpu_raytracer` - the interactive app entry point (main.rs)."""

from .app import interactive
from .utils.config import parse_args
from .utils.tuned import apply_tuned


def main():
    apply_tuned()   # measured-winner gate defaults; explicit env wins
    cfg = parse_args()
    interactive.run(cfg)


if __name__ == "__main__":
    main()
