"""Canonical synthetic SAFE fixture (shared by tests and the driver-certified
source queries).

A deterministic 3-product tree: A.SAFE and B.SAFE are valid GRD products with
vv/vh measurement TIFFs (plus a ``_warped`` intermediate and a stray .txt that
discovery must skip — P5/S3), C.SAFE is broken (no measurement dir — the S2
error-tolerant path). The manifest/annotation XML mirrors the real Sentinel-1
SAFE layout the reference parses (/root/reference/src/io/sentinel1.rs,
studied not copied); values are chosen dyadic/exact so oracles can state them
as SQL literals.
"""

from __future__ import annotations

import os

MANIFEST = """<?xml version="1.0" encoding="UTF-8"?>
<xfdu:XFDU xmlns:xfdu="urn:ccsds:schema:xfdu:1" xmlns:safe="http://www.esa.int/safe/sentinel-1.0">
  <metadataSection>
    <safe:platform><safe:familyName>SENTINEL-1</safe:familyName><safe:number>A</safe:number>
      <safe:instrument><safe:mode>IW</safe:mode></safe:instrument></safe:platform>
    <safe:acquisitionPeriod><safe:startTime>2024-01-15T05:31:02.123456</safe:startTime>
      <safe:stopTime>2024-01-15T05:31:27.654321</safe:stopTime></safe:acquisitionPeriod>
    <safe:orbitReference><safe:orbitNumber>51234</safe:orbitNumber>
      <safe:relativeOrbitNumber>112</safe:relativeOrbitNumber></safe:orbitReference>
    <s1sarl1:standAloneProductInformation xmlns:s1sarl1="http://www.esa.int/safe/sentinel-1.0/sentinel-1/sar/level-1">
      <s1sarl1:productType>GRD</s1sarl1:productType>
      <s1sarl1:transmitterReceiverPolarisation>VV</s1sarl1:transmitterReceiverPolarisation>
      <s1sarl1:transmitterReceiverPolarisation>VH</s1sarl1:transmitterReceiverPolarisation>
    </s1sarl1:standAloneProductInformation>
    <safe:processing><safe:facility name="Copernicus Ground Segment">
      <safe:software name="Sentinel-1 IPF" version="3.61"/></safe:facility></safe:processing>
  </metadataSection>
</xfdu:XFDU>
"""

ANNOTATION = """<?xml version="1.0" encoding="UTF-8"?>
<product>
  <generalAnnotation>
    <productInformation>
      <rangeSamplingRate>64345238.12</rangeSamplingRate>
      <radarFrequency>5405000454.33</radarFrequency>
    </productInformation>
    <downlinkInformation>
      <prf>1717.128973</prf>
      <txPulseLength>5.24e-05</txPulseLength>
    </downlinkInformation>
    <orbitList>
      <orbit><position><x>1</x><y>2</y><z>3</z></position>
        <velocity><vx>3000.0</vx><vy>4000.0</vy><vz>0.0</vz></velocity></orbit>
      <orbit><position><x>1</x><y>2</y><z>3</z></position>
        <velocity><vx>0.0</vx><vy>3000.0</vy><vz>4000.0</vz></velocity></orbit>
      <orbit><position><x>1</x><y>2</y><z>3</z></position>
        <velocity><vx>4000.0</vx><vy>0.0</vy><vz>3000.0</vz></velocity></orbit>
    </orbitList>
  </generalAnnotation>
  <imageAnnotation><imageInformation>
    <slantRangeTime>5.33e-03</slantRangeTime>
    <rangePixelSpacing>10.0</rangePixelSpacing>
    <azimuthPixelSpacing>10.0</azimuthPixelSpacing>
    <numberOfSamples>25124</numberOfSamples>
    <numberOfLines>16704</numberOfLines>
  </imageInformation></imageAnnotation>
</product>
"""

# deterministic per-product GCP boxes for the S10 CRS resolution:
# A -> central Europe zone 32, B -> the Norway exception (5-12E above 56N
# resolves to zone 32 instead of 31)
FIXTURE_GCPS = {
    "A.SAFE": [(8.0, 47.0), (10.0, 49.0)],
    "B.SAFE": [(4.0, 58.0), (6.0, 62.0)],
}


def build_safe_fixture(root: str) -> str:
    """Create the 3-product SAFE tree under ``root`` and return ``root``."""
    for i, name in enumerate(["A.SAFE", "B.SAFE"]):
        p = os.path.join(root, name)
        os.makedirs(os.path.join(p, "annotation"), exist_ok=True)
        os.makedirs(os.path.join(p, "measurement"), exist_ok=True)
        with open(os.path.join(p, "manifest.safe"), "w", encoding="utf-8") as fh:
            fh.write(MANIFEST)
        with open(os.path.join(p, "annotation", "iw-vv.xml"), "w", encoding="utf-8") as fh:
            fh.write(ANNOTATION)
        mea = os.path.join(p, "measurement")
        for fname in (
            f"s1a-iw-grd-vv-{i}.tiff",
            f"s1a-iw-grd-vh-{i}.tiff",
            f"s1a-iw-grd-vv-{i}_warped.tiff",
        ):
            with open(os.path.join(mea, fname), "wb") as fh:
                fh.write(b"II*\x00")
        with open(os.path.join(mea, "notes.txt"), "w", encoding="utf-8") as fh:
            fh.write("not a band")
    broken = os.path.join(root, "C.SAFE")
    os.makedirs(os.path.join(broken, "annotation"), exist_ok=True)
    with open(os.path.join(broken, "manifest.safe"), "w", encoding="utf-8") as fh:
        fh.write(MANIFEST)
    return root
