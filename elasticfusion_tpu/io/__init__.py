"""Dataset readers (.klg, TUM), trajectory writers, PLY export."""
