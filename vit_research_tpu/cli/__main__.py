"""``python -m vit_research_tpu.cli`` entry point."""

from vit_research_tpu.cli import main

if __name__ == "__main__":
    main()
