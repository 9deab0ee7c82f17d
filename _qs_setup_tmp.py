import os, sys
import numpy as np
os.environ.setdefault("NEMO_TPU_PLATFORM", "cpu")
import jax
from nemo_tpu import maps
from nemo_tpu.models import beams
from nemo_tpu.ops import grf
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils.tables import Table
from nemo_tpu.utils import wcs as nwcs
import yaml

outdir = sys.argv[1]
SHAPE = (1031, 1032)  # quickstart tile size
w = nwcs.makeWCS(SHAPE, 0.5/60.0, centreRADeg=35.0, centreDecDeg=0.0)
rng = np.random.default_rng(8)
beams_paths = {}
for band, fwhm, freq, noise in (("f150",1.4,149.6,22.0),("f090",2.1,97.8,33.0)):
    bp = os.path.join(outdir, "beam_%s.txt" % band)
    beams.makeGaussianBeamFile(bp, fwhm)
    beams_paths[band] = bp
n = 25
xs = rng.uniform(80, SHAPE[1]-80, n); ys = rng.uniform(80, SHAPE[0]-80, n)
coords = w.pix2wcs(xs, ys)
tab = Table({"name": np.array(["cl%d"%i for i in range(n)]),
             "RADeg": coords[:,0], "decDeg": coords[:,1],
             "y_c": rng.uniform(1.0, 6.0, n),
             "template": np.array(["Arnaud_M2e14_z0p4"]*n)})
tab.write(os.path.join(outdir, "inputCatalog.fits"))
for band, fwhm, freq, noise in (("f150",1.4,149.6,22.0),("f090",2.1,97.8,33.0)):
    model = maps.makeModelImage(SHAPE, w, tab, beams_paths[band], obsFreqGHz=freq)
    beam = beams.BeamProfile(beamFileName=beams_paths[band])
    pix = maps.pixScalesRad(w, SHAPE)
    cmb = np.asarray(grf.sim_cmb_map(jax.random.PRNGKey(1 if band=="f150" else 2),
                                     SHAPE, pix, beamBell=beam.Bell, beamEll=beam.ell,
                                     noiseLevel=noise))
    nfits.write_image(os.path.join(outdir, "sim_%s.fits"%band), (cmb+model).astype(np.float32), w.header)
config = {
  "unfilteredMaps": [
    {"mapFileName": os.path.join(outdir,"sim_f150.fits"), "weightsFileName": None,
     "obsFreqGHz": 149.6, "units": "uK", "beamFileName": beams_paths["f150"]},
    {"mapFileName": os.path.join(outdir,"sim_f090.fits"), "weightsFileName": None,
     "obsFreqGHz": 97.8, "units": "uK", "beamFileName": beams_paths["f090"]}],
  "thresholdSigma": 4.0, "minObjPix": 1, "findCenterOfMass": True,
  "useInterpolator": True, "rejectBorder": 0, "objIdent": "ACT-CL",
  "longNames": False, "removeRings": False,
  "photFilter": "Arnaud_M2e14_z0p4", "fitQ": False,
  "outputDir": os.path.join(outdir, "nemoOut"),
  "allFilters": {"class": "ArnaudModelMatchedFilter",
      "params": {"noiseParams": {"method": "dataMap", "noiseGridArcmin": 40.0},
                 "saveFilteredMaps": True, "saveRMSMap": True,
                 "outputUnits": "yc", "edgeTrimArcmin": 0.0}},
  "mapFilters": [
    {"label": "Arnaud_M2e14_z0p4", "params": {"M500MSun": 2.0e14, "z": 0.4}},
    {"label": "Arnaud_M4e14_z0p2", "params": {"M500MSun": 4.0e14, "z": 0.2}}],
}
with open(os.path.join(outdir, "quickstart.yml"), "w") as f:
    yaml.safe_dump(config, f)
print("setup done")
