/* ----------------------------------------------------------------------
   fix imagecharges: method-of-image-charges electrode boundary for
   LAMMPS (CPU).  See fix_imagecharges.h for the command grammar.

   Behavior parity:
   /root/reference/lib/lammps-fix-imagecharges/fix_imagecharges.cpp —
   each charged atom in the group is paired with an image particle of
   type `itype`; every timestep (pre_force) the image positions are
   rewritten as reflections across the plane and their charges set to
   -scale * q; image forces are zeroed in post_force so the images are
   kinematically slaved.

   Plane point, normal, and scale each accept `v_name` equal-/atom-
   style variables (grammar at reference :37-76, styles enum :18-23),
   re-evaluated every timestep before the reflection update
   (reference reflection math :357-363).  The reference's own
   non-CONSTANT execution branches are absent (its setup/post_force
   gate on `varflag == CONSTANT`), so the variable styles here are
   evaluated for real rather than mirroring that gap.
------------------------------------------------------------------------- */

#include "fix_imagecharges.h"

#include <cstring>

#include "atom.h"
#include "atom_vec.h"
#include "domain.h"
#include "error.h"
#include "force.h"
#include "group.h"
#include "input.h"
#include "memory.h"
#include "modify.h"
#include "region.h"
#include "update.h"
#include "variable.h"

#include "../imagecharge_math.h"

using namespace LAMMPS_NS;
using namespace FixConst;

// Parameter styles (reference enum :18-23).
enum { NONE, CONSTANT, EQUAL, ATOM };

/* ---------------------------------------------------------------------- */

void FixImageCharges::parseParam(Param &param, const char *arg,
                                 const char *name) {
    if (std::strncmp(arg, "v_", 2) == 0) {
        param.str = utils::strdup(arg + 2);
        param.style = NONE;  // resolved to EQUAL/ATOM in init()
    } else {
        param.value = utils::numeric(FLERR, arg, false, lmp);
        param.style = CONSTANT;
    }
    (void)name;
}

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

    // Plane point and normal: constants or v_ variables
    // (reference :37-76).
    parseParam(px, arg[3], "px");
    parseParam(py, arg[4], "py");
    parseParam(pz, arg[5], "pz");
    parseParam(nx, arg[6], "nx");
    parseParam(ny, arg[7], "ny");
    parseParam(nz, arg[8], "nz");

    // itype: integer or an equal-style variable evaluated once at
    // construction (reference :77-80; the reference reads arg[8]
    // for the variable name there — an off-by-one — this parses the
    // itype argument itself).
    if (std::strncmp(arg[9], "v_", 2) == 0) {
        int itypevar = input->variable->find(arg[9] + 2);
        if (itypevar < 0)
            error->all(FLERR,
                       "Variable itype for fix imagecharges does not "
                       "exist");
        if (input->variable->equalstyle(itypevar))
            itype = static_cast<int>(
                input->variable->compute_equal(itypevar));
        else
            error->all(FLERR,
                       "Variable itype for fix imagecharges has "
                       "invalid style");
    } else {
        itype = utils::inumeric(FLERR, arg[9], false, lmp);
    }

    scaleParam.value = 1.0;
    scaleParam.style = CONSTANT;
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
            parseParam(scaleParam, arg[iarg + 1], "scale");
            iarg += 2;
        } else {
            error->all(FLERR, "Illegal fix imagecharges command");
        }
    }

    nmax = atom->nmax;
    seenCount = addedCount = 0;
    varflag = CONSTANT;

    // Expose the image mapping as a per-atom vector.
    peratom_flag = 1;
    peratom_freq = 1;
    vector_atom = imageid;
    atom->add_callback(Atom::GROW);
}

/* ---------------------------------------------------------------------- */

void FixImageCharges::freeParam(Param &param, Memory *memory) {
    delete[] param.str;
    param.str = nullptr;
    if (param.atomBuf) memory->destroy(param.atomBuf);
    param.atomBuf = nullptr;
}

FixImageCharges::~FixImageCharges() {
    delete[] idregion;
    freeParam(px, memory);
    freeParam(py, memory);
    freeParam(pz, memory);
    freeParam(nx, memory);
    freeParam(ny, memory);
    freeParam(nz, memory);
    freeParam(scaleParam, memory);
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

void FixImageCharges::initParam(Param &param, const char *name) {
    if (!param.str) return;
    param.var = input->variable->find(param.str);
    if (param.var < 0)
        error->all(FLERR,
                   "Variable {} for fix imagecharges does not exist",
                   name);
    if (input->variable->equalstyle(param.var))
        param.style = EQUAL;
    else if (input->variable->atomstyle(param.var))
        param.style = ATOM;
    else
        error->all(FLERR,
                   "Variable {} for fix imagecharges has invalid "
                   "style",
                   name);
}

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

    // Resolve v_ parameters to EQUAL/ATOM styles (reference
    // init() :155-195).
    initParam(px, "px");
    initParam(py, "py");
    initParam(pz, "pz");
    initParam(nx, "nx");
    initParam(ny, "ny");
    initParam(nz, "nz");
    initParam(scaleParam, "scale");

    Param *params[7] = {&px, &py, &pz, &nx, &ny, &nz, &scaleParam};
    varflag = CONSTANT;
    for (Param *p : params) {
        if (p->style == ATOM)
            varflag = ATOM;
        else if (p->style == EQUAL && varflag == CONSTANT)
            varflag = EQUAL;
    }
}

/* ----------------------------------------------------------------------
   Re-evaluate variable-style parameters: equal-style into the scalar
   value, atom-style into a per-atom buffer.  Runs at the top of every
   setup_pre_force/pre_force call, so moving planes and time-dependent
   scales track the simulation clock.
------------------------------------------------------------------------- */

void FixImageCharges::evaluateParams() {
    if (varflag == CONSTANT) return;
    const int nlocal = atom->nlocal;

    modify->clearstep_compute();
    Param *params[7] = {&px, &py, &pz, &nx, &ny, &nz, &scaleParam};
    for (Param *p : params) {
        if (p->style == EQUAL) {
            p->value = input->variable->compute_equal(p->var);
        } else if (p->style == ATOM) {
            if (nlocal > p->maxatom) {
                p->maxatom = atom->nmax;
                memory->grow(p->atomBuf, p->maxatom,
                             "imagecharges:param_atom");
            }
            input->variable->compute_atom(p->var, igroup, p->atomBuf,
                                          1, 0);
        }
    }
    modify->addstep_compute(update->ntimestep + 1);
}

/* ----------------------------------------------------------------------
   The mirror parameters seen by atom i this step.
------------------------------------------------------------------------- */

void FixImageCharges::paramAt(int i, double p[3], double n[3],
                              double *scale) const {
    const Param *plane[3] = {&px, &py, &pz};
    const Param *normal[3] = {&nx, &ny, &nz};
    for (int k = 0; k < 3; k++) {
        p[k] = plane[k]->style == ATOM ? plane[k]->atomBuf[i]
                                       : plane[k]->value;
        n[k] = normal[k]->style == ATOM ? normal[k]->atomBuf[i]
                                        : normal[k]->value;
    }
    *scale = scaleParam.style == ATOM ? scaleParam.atomBuf[i]
                                      : scaleParam.value;
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

    evaluateParams();

    // Reset the mapping.
    for (int i = 0; i < atom->nmax; i++) imagei[i] = -2;

    int atomIndex = nlocal;
    for (int i = 0; i < nlocal; i++) {
        if (!(mask[i] & groupbit)) continue;
        if (region && !region->match(x[i][0], x[i][1], x[i][2]))
            continue;

        double p[3], n[3], scale;
        paramAt(i, p, n, &scale);
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
   Every step: re-evaluate variable parameters, then rewrite image
   positions as reflections of their parents and refresh the image
   charges.
------------------------------------------------------------------------- */

void FixImageCharges::pre_force(int /*vflag*/) {
    double **x = atom->x;
    double *q = atom->q;
    int *mask = atom->mask;
    int nlocal = atom->nlocal;

    evaluateParams();

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

        double p[3], n[3], scale;
        paramAt(i, p, n, &scale);
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
    double bytes = 2.0 * nmax * sizeof(double);
    const Param *params[7] = {&px, &py, &pz, &nx, &ny, &nz,
                              &scaleParam};
    for (const Param *p : params)
        bytes += p->maxatom * sizeof(double);
    return bytes;
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
