from cl4wsis_tpu.cl import tasks


def test_task_list():
    tl = tasks.get_task_list()
    assert "15-5" in tl and "voc" in tl and "offline" in tl


def test_voc_15_5():
    labels, labels_old, path = tasks.get_task_labels("voc", "15-5", 1)
    assert labels == [16, 17, 18, 19, 20]
    assert labels_old == list(range(16))
    assert path == "voc/15-5"
    assert tasks.get_per_task_classes("voc", "15-5", 1) == [16, 5]


def test_voc_10_5_multistep():
    assert tasks.get_per_task_classes("voc", "10-5", 2) == [11, 5, 5]
    d = tasks.get_task_dict("voc", "10-5", 1)
    assert set(d.keys()) == {0, 1}


def test_coco_voc():
    labels, labels_old, _ = tasks.get_task_labels("coco-voc", "voc", 1)
    assert len(labels) == 20 and len(labels_old) == 61


def test_bad_task():
    import pytest
    with pytest.raises(NotImplementedError):
        tasks.get_task_labels("voc", "nope", 0)
    with pytest.raises(ValueError):
        tasks.get_task_labels("voc", "15-5", 3)
