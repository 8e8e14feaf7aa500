"""Dataset class vocabularies and background-category prompt lists.

Data tables matching the reference's datasets/clip_text.py:6-62 and
datasets/{voc,coco}.py class_list constants. The "new" names are the curated
prompt aliases the text encoder actually sees; the plain names are used for
metric tables.
"""

VOC_CLASSES = [
    "_background_", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

VOC_PROMPT_CLASSES = [
    "aeroplane", "bicycle", "bird avian", "boat", "bottle",
    "bus", "car", "cat", "chair seat", "cow",
    "diningtable", "dog", "horse", "motorbike",
    "person with clothes,people,human",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor screen",
]

VOC_BACKGROUND = [
    "ground", "land", "grass", "tree", "building", "wall", "sky", "lake",
    "water", "river", "sea", "railway", "railroad", "keyboard", "helmet",
    "cloud", "house", "mountain", "ocean", "road", "rock", "street",
    "valley", "bridge", "sign",
]

COCO_CLASSES = [
    "_background_",
    "person", "bicycle", "car", "motorbike", "aeroplane",
    "bus", "train", "truck", "boat", "traffic light",
    "fire hydrant", "stop sign", "parking meter", "bench", "bird",
    "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee",
    "skis", "snowboard", "sports ball", "kite", "baseball bat",
    "baseball glove", "skateboard", "surfboard", "tennis racket", "bottle",
    "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut",
    "cake", "chair", "sofa", "pottedplant", "bed",
    "diningtable", "toilet", "tvmonitor", "laptop", "mouse",
    "remote", "keyboard", "cell phone", "microwave", "oven",
    "toaster", "sink", "refrigerator", "book", "clock",
    "vase", "scissors", "teddy bear", "hair drier", "toothbrush",
]

COCO_PROMPT_CLASSES = [
    "person with clothes,people,human", "bicycle", "car", "motorbike",
    "aeroplane",
    "bus", "train", "truck", "boat", "traffic light",
    "fire hydrant", "stop sign", "parking meter", "bench", "bird avian",
    "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack,bag",
    "umbrella,parasol", "handbag,purse", "necktie", "suitcase", "frisbee",
    "skis", "sknowboard", "sports ball", "kite", "baseball bat",
    "glove", "skateboard", "surfboard", "tennis racket", "bottle",
    "wine glass", "cup", "fork", "knife", "dessertspoon",
    "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut",
    "cake", "chair seat", "sofa", "pottedplant", "bed",
    "diningtable", "toilet", "tvmonitor screen", "laptop", "mouse",
    "remote control", "keyboard", "cell phone", "microwave", "oven",
    "toaster", "sink", "refrigerator", "book", "clock",
    "vase", "scissors", "teddy bear", "hairdrier,blowdrier", "toothbrush",
]

COCO_BACKGROUND = [
    "ground", "land", "grass", "tree", "building", "wall", "sky", "lake",
    "water", "river", "sea", "railway", "railroad", "helmet",
    "cloud", "house", "mountain", "ocean", "road", "rock", "street",
    "valley", "bridge",
]


def prompt_vocabulary(dataset: str) -> list[str]:
    """Foreground prompt names + background categories, in surgery order.

    Mirrors model/model_excel.py:33: fg classes first, then background
    categories appended as extra "classes" for feature surgery.
    """
    if dataset in ("pascal_voc", "voc"):
        return VOC_PROMPT_CLASSES + VOC_BACKGROUND
    if dataset in ("ms_coco", "coco"):
        return COCO_PROMPT_CLASSES + COCO_BACKGROUND
    raise ValueError(f"unknown dataset {dataset!r}")


def class_list(dataset: str) -> list[str]:
    """Evaluation class names incl. background (datasets/voc.py:18,
    datasets/coco.py:12)."""
    if "voc" in dataset:
        return VOC_CLASSES
    if "coco" in dataset:
        return COCO_CLASSES
    raise ValueError(f"unknown dataset {dataset!r}")
