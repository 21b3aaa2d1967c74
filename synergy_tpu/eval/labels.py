"""Class-label tables for the downstream evaluation suites.

Equivalents of the reference's embedded label dictionaries
(reference ZS/ZS_image_task.py:27-1289, ZS/ZS_audio_task.py fold categories,
DT/FT_*.py dataset setups). These are the standard public label lists for
each benchmark; underscores are kept/removed exactly as each dataset ships
them so prompt text matches the reference protocol.

ImageNet-1k's 1000-name table is embedded in ``labels_imagenet.py``
(reference ZS_image_task.py:27-1028 embeds the same public table); a
user-supplied JSON (``imagenet_labels.json``) still overrides it when
present, e.g. for a different naming convention.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

CIFAR10: List[str] = [
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
]

CIFAR100: List[str] = [
    "apple", "aquarium_fish", "baby", "bear", "beaver", "bed", "bee",
    "beetle", "bicycle", "bottle", "bowl", "boy", "bridge", "bus",
    "butterfly", "camel", "can", "castle", "caterpillar", "cattle", "chair",
    "chimpanzee", "clock", "cloud", "cockroach", "couch", "crab",
    "crocodile", "cup", "dinosaur", "dolphin", "elephant", "flatfish",
    "forest", "fox", "girl", "hamster", "house", "kangaroo", "keyboard",
    "lamp", "lawn_mower", "leopard", "lion", "lizard", "lobster", "man",
    "maple_tree", "motorcycle", "mountain", "mouse", "mushroom", "oak_tree",
    "orange", "orchid", "otter", "palm_tree", "pear", "pickup_truck",
    "pine_tree", "plain", "plate", "poppy", "porcupine", "possum", "rabbit",
    "raccoon", "ray", "road", "rocket", "rose", "sea", "seal", "shark",
    "shrew", "skunk", "skyscraper", "snail", "snake", "spider", "squirrel",
    "streetcar", "sunflower", "sweet_pepper", "table", "tank", "telephone",
    "television", "tiger", "tractor", "train", "trout", "tulip", "turtle",
    "wardrobe", "whale", "willow_tree", "wolf", "woman", "worm",
]

OXFORD_PETS: List[str] = [
    "Abyssinian", "american bulldog", "american pit bull terrier",
    "basset hound", "beagle", "Bengal", "Birman", "Bombay", "boxer",
    "British Shorthair", "chihuahua", "Egyptian Mau",
    "english cocker spaniel", "english setter", "german shorthaired",
    "great pyrenees", "havanese", "japanese chin", "keeshond", "leonberger",
    "Maine Coon", "miniature pinscher", "newfoundland", "Persian",
    "pomeranian", "pug", "Ragdoll", "Russian Blue", "saint bernard",
    "samoyed", "scottish terrier", "shiba inu", "Siamese", "Sphynx",
    "staffordshire bull terrier", "wheaten terrier", "yorkshire terrier",
]

FLOWERS102: List[str] = [
    "pink primrose", "hard-leaved pocket orchid", "canterbury bells",
    "sweet pea", "english marigold", "tiger lily", "moon orchid",
    "bird of paradise", "monkshood", "globe thistle", "snapdragon",
    "colt's foot", "king protea", "spear thistle", "yellow iris",
    "globe-flower", "purple coneflower", "peruvian lily", "balloon flower",
    "giant white arum lily", "fire lily", "pincushion flower", "fritillary",
    "red ginger", "grape hyacinth", "corn poppy", "prince of wales feathers",
    "stemless gentian", "artichoke", "sweet william", "carnation",
    "garden phlox", "love in the mist", "mexican aster", "alpine sea holly",
    "ruby-lipped cattleya", "cape flower", "great masterwort", "siam tulip",
    "lenten rose", "barbeton daisy", "daffodil", "sword lily", "poinsettia",
    "bolero deep blue", "wallflower", "marigold", "buttercup", "oxeye daisy",
    "common dandelion", "petunia", "wild pansy", "primula", "sunflower",
    "pelargonium", "bishop of llandaff", "gaura", "geranium", "orange dahlia",
    "pink-yellow dahlia", "cautleya spicata", "japanese anemone",
    "black-eyed susan", "silverbush", "californian poppy", "osteospermum",
    "spring crocus", "bearded iris", "windflower", "tree poppy", "gazania",
    "azalea", "water lily", "rose", "thorn apple", "morning glory",
    "passion flower", "lotus", "toad lily", "anthurium", "frangipani",
    "clematis", "hibiscus", "columbine", "desert-rose", "tree mallow",
    "magnolia", "cyclamen", "watercress", "canna lily", "hippeastrum",
    "bee balm", "ball moss", "foxglove", "bougainvillea", "camellia",
    "mallow", "mexican petunia", "bromelia", "blanket flower",
    "trumpet creeper", "blackberry lily",
]

ESC50: List[str] = [
    "dog", "rooster", "pig", "cow", "frog", "cat", "hen", "insects",
    "sheep", "crow", "rain", "sea_waves", "crackling_fire", "crickets",
    "chirping_birds", "water_drops", "wind", "pouring_water", "toilet_flush",
    "thunderstorm", "crying_baby", "sneezing", "clapping", "breathing",
    "coughing", "footsteps", "laughing", "brushing_teeth", "snoring",
    "drinking_sipping", "door_wood_knock", "mouse_click", "keyboard_typing",
    "door_wood_creaks", "can_opening", "washing_machine", "vacuum_cleaner",
    "clock_alarm", "clock_tick", "glass_breaking", "helicopter", "chainsaw",
    "siren", "car_horn", "engine", "train", "church_bells", "airplane",
    "fireworks", "hand_saw",
]

URBANSOUND8K: List[str] = [
    "air_conditioner", "car_horn", "children_playing", "dog_bark",
    "drilling", "engine_idling", "gun_shot", "jackhammer", "siren",
    "street_music",
]


def imagenet_labels(path: str = "imagenet_labels.json") -> List[str]:
    """The 1000 ImageNet-1k class names (embedded, no external file needed);
    a user-supplied JSON list at ``path`` overrides the built-in table."""
    if os.path.exists(path):
        with open(path) as f:
            labels = json.load(f)
        assert len(labels) == 1000
        return labels
    from synergy_tpu.eval.labels_imagenet import IMAGENET_1K

    return list(IMAGENET_1K)


LABELS: Dict[str, List[str]] = {
    "cifar-10": CIFAR10,
    "cifar-100": CIFAR100,
    "pets": OXFORD_PETS,
    "flowers": FLOWERS102,
    "esc50": ESC50,
    "urbansound8k": URBANSOUND8K,
}


def clean_label(label: str) -> str:
    """Underscored dataset labels -> prompt text ('sea_waves' -> 'sea waves')."""
    return label.replace("_", " ")
