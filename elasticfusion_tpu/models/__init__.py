"""Map-side model components: surfel map, ferns, deformation graph."""
