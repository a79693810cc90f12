/* ----------------------------------------------------------------------
   fix imagecharges: method-of-image-charges electrode boundary for
   LAMMPS (CPU).  See fix_imagecharges.h for the command grammar.

   Behavior parity:
   /root/reference/lib/lammps-fix-imagecharges/fix_imagecharges.cpp —
   each charged atom in the group is paired with an image particle of
   type `itype`; every timestep (pre_force) the image positions are
   rewritten as reflections across the plane and their charges set to
   -scale * q; image forces are zeroed in post_force so the images are
   kinematically slaved.  Constant (non-variable) plane/scale
   parameters only.
------------------------------------------------------------------------- */

#include "fix_imagecharges.h"

#include <cstring>

#include "atom.h"
#include "atom_vec.h"
#include "domain.h"
#include "error.h"
#include "force.h"
#include "group.h"
#include "memory.h"
#include "region.h"
#include "update.h"

#include "../imagecharge_math.h"

using namespace LAMMPS_NS;
using namespace FixConst;

/* ---------------------------------------------------------------------- */

FixImageCharges::FixImageCharges(LAMMPS *lmp, int narg, char **arg)
    : Fix(lmp, narg, arg),
      idregion(nullptr),
      region(nullptr),
      imagei(nullptr),
      imageid(nullptr) {
    if (narg < 10)
        error->all(FLERR,
                   "Illegal fix imagecharges command: not enough "
                   "arguments");

    memory->create(imagei, atom->nmax + 2, "imagecharges:imagei");
    memory->create(imageid, atom->nmax + 2, "imagecharges:imageid");

    pxvalue = utils::numeric(FLERR, arg[3], false, lmp);
    pyvalue = utils::numeric(FLERR, arg[4], false, lmp);
    pzvalue = utils::numeric(FLERR, arg[5], false, lmp);
    nxvalue = utils::numeric(FLERR, arg[6], false, lmp);
    nyvalue = utils::numeric(FLERR, arg[7], false, lmp);
    nzvalue = utils::numeric(FLERR, arg[8], false, lmp);
    itype = utils::inumeric(FLERR, arg[9], false, lmp);

    scale = 1.0;
    int iarg = 10;
    while (iarg < narg) {
        if (strcmp(arg[iarg], "region") == 0) {
            if (iarg + 2 > narg)
                error->all(FLERR, "Illegal fix imagecharges command");
            region = domain->get_region_by_id(arg[iarg + 1]);
            if (!region)
                error->all(FLERR,
                           "Region {} for fix imagecharges does not "
                           "exist",
                           arg[iarg + 1]);
            idregion = utils::strdup(arg[iarg + 1]);
            iarg += 2;
        } else if (strcmp(arg[iarg], "scale") == 0) {
            if (iarg + 2 > narg)
                error->all(FLERR, "Illegal fix imagecharges command");
            scale = utils::numeric(FLERR, arg[iarg + 1], false, lmp);
            iarg += 2;
        } else {
            error->all(FLERR, "Illegal fix imagecharges command");
        }
    }

    nmax = atom->nmax;
    seenCount = addedCount = 0;

    // Expose the image mapping as a per-atom vector.
    peratom_flag = 1;
    peratom_freq = 1;
    vector_atom = imageid;
    atom->add_callback(Atom::GROW);
}

/* ---------------------------------------------------------------------- */

FixImageCharges::~FixImageCharges() {
    delete[] idregion;
    memory->destroy(imagei);
    memory->destroy(imageid);
    atom->delete_callback(id, Atom::GROW);
}

/* ---------------------------------------------------------------------- */

int FixImageCharges::setmask() {
    int mask = 0;
    mask |= PRE_FORCE;
    mask |= POST_FORCE;
    mask |= MIN_PRE_FORCE;
    mask |= MIN_POST_FORCE;
    return mask;
}

/* ---------------------------------------------------------------------- */

void FixImageCharges::init() {
    if (idregion) {
        region = domain->get_region_by_id(idregion);
        if (!region)
            error->all(FLERR,
                       "Region {} for fix imagecharges does not exist",
                       idregion);
    }
    if (!atom->q_flag)
        error->all(FLERR,
                   "Fix imagecharges requires atom attribute q");
}

/* ----------------------------------------------------------------------
   Assign every group atom an image partner, creating new atoms for
   those that lack one.
------------------------------------------------------------------------- */

void FixImageCharges::setup_pre_force(int /*vflag*/) {
    double **x = atom->x;
    double *q = atom->q;
    int *mask = atom->mask;
    int nlocal = atom->nlocal;

    const double p[3] = {pxvalue, pyvalue, pzvalue};
    const double n[3] = {nxvalue, nyvalue, nzvalue};

    // Reset the mapping.
    for (int i = 0; i < atom->nmax; i++) imagei[i] = -2;

    int atomIndex = nlocal;
    for (int i = 0; i < nlocal; i++) {
        if (!(mask[i] & groupbit)) continue;
        if (region && !region->match(x[i][0], x[i][1], x[i][2]))
            continue;

        double r[3];
        ImageCharges::reflectAcrossPlane(x[i], p, n, r);
        atom->avec->create_atom(itype, r);
        const int j = atomIndex++;
        atom->q[j] = ImageCharges::imageCharge(q[i], scale);
        atom->mask[j] |= groupbit;
        imagei[i] = j;
        imageid[i] = j;
        imagei[j] = -1;  // marks an image particle
        imageid[j] = -1;
        addedCount++;
    }

    atom->natoms += addedCount;
    if (atom->natoms < 0 || atom->nlocal + addedCount < 0)
        error->all(FLERR, "Too many total atoms");

    if (atom->map_style != Atom::MAP_NONE) {
        atom->nghost = 0;
        atom->map_init();
        atom->map_set();
    }
}

void FixImageCharges::min_setup_pre_force(int vflag) {
    setup_pre_force(vflag);
}

/* ----------------------------------------------------------------------
   Every step: rewrite image positions as reflections of their parents
   and refresh the image charges.
------------------------------------------------------------------------- */

void FixImageCharges::pre_force(int /*vflag*/) {
    double **x = atom->x;
    double *q = atom->q;
    int *mask = atom->mask;
    int nlocal = atom->nlocal;

    const double p[3] = {pxvalue, pyvalue, pzvalue};
    const double n[3] = {nxvalue, nyvalue, nzvalue};

    seenCount = 0;
    for (int i = 0; i < nlocal; i++) {
        if (!(mask[i] & groupbit)) continue;
        const int j = imagei[i];
        if (j == -1) {
            // This is an image particle; its parent updates it.
            seenCount++;
            continue;
        }
        if (j < 0 || j >= nlocal) continue;

        double r[3];
        ImageCharges::reflectAcrossPlane(x[i], p, n, r);
        x[j][0] = r[0];
        x[j][1] = r[1];
        x[j][2] = r[2];
        q[j] = ImageCharges::imageCharge(q[i], scale);
    }
}

void FixImageCharges::min_pre_force(int vflag) { pre_force(vflag); }

/* ----------------------------------------------------------------------
   Zero the forces on image particles: they are slaved to their
   parents, not integrated.
------------------------------------------------------------------------- */

void FixImageCharges::post_force(int /*vflag*/) {
    double **f = atom->f;
    double **v = atom->v;
    int nlocal = atom->nlocal;

    for (int i = 0; i < nlocal; i++) {
        if (imagei[i] == -1) {
            f[i][0] = f[i][1] = f[i][2] = 0.0;
            v[i][0] = v[i][1] = v[i][2] = 0.0;
        }
    }
}

void FixImageCharges::min_post_force(int vflag) { post_force(vflag); }

/* ----------------------------------------------------------------------
   Per-atom array bookkeeping so the mapping survives sorts/exchanges.
------------------------------------------------------------------------- */

double FixImageCharges::memory_usage() {
    return 2.0 * nmax * sizeof(double);
}

void FixImageCharges::grow_arrays(int nmax_new) {
    memory->grow(imagei, nmax_new + 2, "imagecharges:imagei");
    memory->grow(imageid, nmax_new + 2, "imagecharges:imageid");
    nmax = nmax_new;
    vector_atom = imageid;
}

void FixImageCharges::copy_arrays(int i, int j, int /*delflag*/) {
    imagei[j] = imagei[i];
    imageid[j] = imageid[i];
}

void FixImageCharges::set_arrays(int i) {
    imagei[i] = -2;
    imageid[i] = -2;
}

int FixImageCharges::pack_exchange(int i, double *buf) {
    buf[0] = imagei[i];
    buf[1] = imageid[i];
    return 2;
}

int FixImageCharges::unpack_exchange(int nlocal, double *buf) {
    imagei[nlocal] = static_cast<int>(buf[0]);
    imageid[nlocal] = buf[1];
    return 2;
}
