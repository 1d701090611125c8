"""Detection losses: task-aligned assignment + YOLO losses, DETR matcher + losses."""
